"""Streaming end-to-end smoke: the reference pipeline as Structured
Streaming, with a kill-and-restart on the same checkpoint.

Drives streaming/ingest.py the way a deployment would (file-source
stand-in for Kafka): write 1000 envelope events → availableNow ingest
→ stop → 500 more while "down" → restart with the same checkpoint →
assert exactly-once (1500 distinct refs, no re-ingest, field=value
partition dirs on disk). Prints "STREAMING OK ..." on success.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_events(src: str, lo: int, hi: int) -> None:
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, f"batch_{lo}_{hi}.txt"), "w") as f:
        for i in range(lo, hi):
            inner = json.dumps(
                {
                    "after": {
                        "ref": i,
                        "city_id": i % 97,
                        "city_name": f"City{i % 13}",
                        "c_time": 1755000000000 + i * 600_000,
                    }
                }
            )
            f.write(json.dumps({"value": inner}) + "\n")


def main() -> None:
    from flink_hiveorc_spark.session import get_spark
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        read_committed,
        start_city_ingest,
    )

    root = tempfile.mkdtemp(prefix="stream_smoke_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    spark = get_spark("stream-smoke", cpus=8, shuffle_partitions=8)
    try:
        write_events(src, 0, 1000)
        q = start_city_ingest(file_raw_stream(spark, src), out, ckpt, available_now=True)
        assert q.awaitTermination(180), "first ingest still running after 180s"
        n1 = read_committed(spark, out).count()
        assert n1 == 1000, f"first run: {n1} != 1000"

        write_events(src, 1000, 1500)
        q2 = start_city_ingest(file_raw_stream(spark, src), out, ckpt, available_now=True)
        assert q2.awaitTermination(180), "restarted ingest still running after 180s"
        back = read_committed(spark, out)
        n2, nd = back.count(), back.select("ref").distinct().count()
        assert n2 == 1500 and nd == 1500, f"restart: rows={n2} distinct={nd} (want 1500/1500)"

        parts = [d for d in os.listdir(out) if d.startswith("c_date=")]
        assert parts, "no field=value partition dirs"
        print(f"STREAMING OK rows={n2} distinct_refs={nd} partitions={len(parts)}")
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
