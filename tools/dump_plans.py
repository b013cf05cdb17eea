"""Dump `.explain("formatted")` output for named queries to files.

Used in optimization rounds to commit before/after physical plans under
plans/r<N>/ so plan-shape claims in OPTIMIZATION_r<N>.md are checkable
without running Spark.

Usage:
  python tools/dump_plans.py OUTDIR SUFFIX [sf_dir] name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query name. The special bench
query `sim_ivf_search_persisted` (bench.py's persisted-index search) is
supported by building the index the same way bench.py does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain_formatted(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir, suffix, *rest = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    os.makedirs(outdir, exist_ok=True)

    from flink_hiveorc_spark.registry import QUERIES
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("dump_plans")

    for name in rest:
        if name == "sim_ivf_search_persisted":
            import bench

            fn = bench._make_ivf_search(spark, sf_dir)
            df = fn(spark, sf_dir)
        else:
            df = QUERIES[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(_explain_formatted(df))
            fh.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
