"""Per-query phase profiler (optimization round instrument).

Splits a query's wall time into:
- build:  Python DataFrame-DSL construction (driver Python; includes
  any collect()/checkpoint jobs the query runs while building)
- plan:   analysis + optimization + physical planning of the FINAL
  frame (py4j call into queryExecution().executedPlan())
- exec*:  three noop-sink writes (first pays codegen compile; later
  runs hit the generated-class cache)

Usage: python tools/profile_query.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from flink_hiveorc_spark.registry import QUERIES
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("profile")
    # generic warmup so the first profiled query doesn't eat JVM warmup
    QUERIES["sort_limit_top_lineitems"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        fn = QUERIES[name]
        # cold full run first (warms codegen for THIS query's plans)
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_cold = time.monotonic() - t0

        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        t_build = time.monotonic() - t0

        t0 = time.monotonic()
        df._jdf.queryExecution().executedPlan()
        t_plan = time.monotonic() - t0

        execs = []
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            execs.append(round(time.monotonic() - t0, 3))
        # a FRESH frame each run (what bench.py actually times)
        fresh = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            fresh.append(round(time.monotonic() - t0, 3))
        print(
            f"{name}: cold={t_cold:.3f} build={t_build:.3f} plan={t_plan:.3f} "
            f"exec(same df)={execs} fresh={fresh}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
