"""Full-surface timing sweep: every registered query once at the
given sf, slowest first — the outlier detector that found the
O(words²) bigram construction in round 4 (text_bigram_familiarity sat
at 12.7 s while every benched query was <2.5 s; bench.py only covers
the ~30 HEADLINE queries, so a regression in the other 130 is
invisible until this sweep or a driver timeout).

Usage: python tools/time_all_queries.py [sf_dir] [--warm N]

Caveats baked in:
- the first few queries pay JVM/codegen warmup; with --warm 0 the
  top of the list ALWAYS contains cold-start noise. Default --warm 1
  runs each query once untimed before its timed run (2× total work,
  honest per-query numbers).
- timings are single-run: anything surprising deserves a median-of-3
  re-check before acting (see bench.py) — this tool ranks, it does
  not certify.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    warm = 1
    if "--warm" in sys.argv:
        warm = int(sys.argv[sys.argv.index("--warm") + 1])

    from flink_hiveorc_spark.registry import QUERIES
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("time-all")
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    try:
        for name, fn in QUERIES.items():
            try:
                for _ in range(warm):
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[name] = time.monotonic() - t0
            except Exception as e:  # keep sweeping; report at the end
                errs[name] = f"{type(e).__name__}: {e}"[:160]
        for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"{t:8.2f}  {name}")
        print(f"\n{len(times)} timed, total {sum(times.values()):.1f}s at {sf_dir}")
        for name, e in errs.items():
            print("ERR", name, e)
    finally:
        spark.stop()
    if errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
