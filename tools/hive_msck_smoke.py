"""Hive-metastore (embedded derby) smoke for register_partitions.

The in-memory catalog used by pytest can't execute MSCK REPAIR, so the
fallback path is all the suite exercises. This drives the REAL path
end-to-end, reproducing the reference's operational gap and our fix:
HiveOrcSink writes `field=value` dirs under the warehouse but never
tells the metastore (SURVEY.md §1.3); a catalog reader then sees
nothing until partitions are registered.

Scenario:
  1. create a partitioned Hive ORC table,
  2. write partition dirs DIRECTLY to the table location (what the
     reference's sink does: files only, no metastore call),
  3. catalog read → 0 rows (the gap),
  4. register_partitions → MSCK discovers the dirs → rows visible,
  5. append more files into an EXISTING partition → REFRESH makes
     them visible too (MSCK alone would not — it only finds new dirs).

Runs in its own process (one SparkContext per JVM; the derby
metastore_db is process-local). Prints HIVE_MSCK_OK on success.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    d = tempfile.mkdtemp(prefix="hive_msck_")
    from pyspark.sql import SparkSession

    from flink_hiveorc_spark.sinks.hive_orc import register_partitions

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", f"{d}/wh")
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={d}/metastore_db;create=true",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.sql(
            "CREATE TABLE t_city (ref BIGINT, city_name STRING) "
            "PARTITIONED BY (c_date STRING) STORED AS ORC"
        )
        loc = (
            spark.sql("DESCRIBE FORMATTED t_city")
            .filter("col_name='Location'")
            .collect()[0][1]
        )
        # (2) reference-style write: partition dirs, no metastore call.
        for day, n in [("2025-01-01", 3), ("2025-01-02", 5)]:
            spark.range(n).selectExpr("id AS ref", "'x' AS city_name").write.format(
                "orc"
            ).mode("overwrite").save(f"{loc}/c_date={day}")
        # (3) the gap: catalog sees nothing.
        assert spark.table("t_city").count() == 0, "expected 0 rows pre-registration"
        # (4) register → both partitions visible.
        register_partitions(spark, "t_city", loc)
        assert spark.table("t_city").count() == 8
        parts = {r.partition for r in spark.sql("SHOW PARTITIONS t_city").collect()}
        assert parts == {"c_date=2025-01-01", "c_date=2025-01-02"}, parts
        # (5) append files into an EXISTING partition dir; MSCK alone
        # would not surface them — register_partitions' REFRESH must.
        spark.range(2).selectExpr("id + 100 AS ref", "'y' AS city_name").write.format(
            "orc"
        ).mode("append").save(f"{loc}/c_date=2025-01-02")
        register_partitions(spark, "t_city", loc)
        assert spark.table("t_city").count() == 10
        # Partition pruning through the metastore: only the day-2 dir scans.
        assert spark.table("t_city").filter("c_date='2025-01-02'").count() == 7
        print("HIVE_MSCK_OK rows=10 partitions=2")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
