"""Ingest-throughput bench: the reference's actual workload (CDC JSON
envelope → decode → UTC+8 date → partitioned ORC, exactly-once)
measured as rows/second on this node.

The reference publishes no numbers (BASELINE.md), but its operational
envelope is known: ~5 MB file rolls, 1 s checkpoints, per-subtask ORC
writers (HiveOrcSink.java:39,215; App.txt:40-42). This drives the
Structured Streaming ingest over a generated envelope corpus and
reports end-to-end throughput including checkpointing and manifest
commits — the number to compare against any single-node Flink run of
the reference job.

Usage: python tools/ingest_bench.py [n_rows] [n_files]
Prints one JSON line {"metric": "ingest_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from flink_hiveorc_spark.session import get_spark
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        read_committed,
        start_city_ingest,
    )

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    # Generate the envelope corpus up front (generation excluded from
    # the timed window): n_files files, spread over ~30 days of
    # event time so the sink exercises multi-partition fan-out.
    t0_ms = 1_755_000_000_000
    per_file = n_rows // n_files
    row_id = 0
    for f_idx in range(n_files):
        with open(os.path.join(src, f"f{f_idx:04d}.txt"), "w") as fh:
            for _ in range(per_file):
                c_time = t0_ms + (row_id % 30) * 86_400_000 + row_id
                inner = json.dumps(
                    {
                        "after": {
                            "ref": row_id,
                            "city_id": row_id % 1000,
                            "city_name": f"city_{row_id % 50}",
                            "c_time": c_time,
                        }
                    }
                )
                fh.write(json.dumps({"value": inner}) + "\n")
                row_id += 1

    spark = get_spark("ingest-bench")
    out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
    t_start = time.monotonic()
    q = start_city_ingest(
        file_raw_stream(spark, src), out, ckpt, available_now=True
    )
    q.awaitTermination(600)
    elapsed = time.monotonic() - t_start
    n_committed = read_committed(spark, out).count()
    partitions = len([d for d in os.listdir(out) if d.startswith("c_date=")])
    print(
        json.dumps(
            {
                "metric": "ingest_rows_per_sec",
                "value": round(n_committed / elapsed, 1),
                "unit": "rows/sec",
                "rows": n_committed,
                "elapsed_sec": round(elapsed, 2),
                "partitions": partitions,
                "exactly_once": n_committed == row_id,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
