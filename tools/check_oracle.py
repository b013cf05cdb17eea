"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf_dir, compares row count, column names, and
order-insensitive values (exact, with float diff reporting for
near-misses). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import os

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = canon(spark_pdf.copy()), canon(duck_pdf.copy())
    for c in s.columns:
        sc, dc = s[c], d[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(dc):
            exact = (sc.fillna(-1.2345e300) == dc.fillna(-1.2345e300))
            if not exact.all():
                diff = (sc - dc).abs()
                problems.append(
                    f"col {c}: {int((~exact).sum())}/{len(s)} float mismatches, max abs diff {diff.max():.3e}"
                )
        else:
            sc2, dc2 = sc.astype(str), dc.astype(str)
            if not (sc2 == dc2).all():
                idx = (sc2 != dc2).idxmax()
                problems.append(f"col {c}: value mismatch e.g. row {idx}: spark={sc2[idx]!r} duck={dc2[idx]!r}")
    return problems


def main() -> None:
    import __spark_entry__ as entrymod
    from flink_hiveorc_spark.session import get_spark

    import os as _os
    _cpus = int(_os.environ.get("SPARK_ORACLE_CPUS", "16"))
    spark = get_spark("oracle-check", cpus=_cpus, shuffle_partitions=_cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = ONLY - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"(rows-only) {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} spark rows, {len(ddf)} duck rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
