"""Catalog-table surface: bucketed co-located joins (no-shuffle
fact⋈fact) and partition registration/recovery (S6 — the operational
gap the reference leaves open, SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.flagship import city_shaped_events
from flink_hiveorc_spark.plans import audit as A
from flink_hiveorc_spark.sinks.bucketed import bucketed_join, write_bucketed
from flink_hiveorc_spark.sinks.hive_orc import write_partitioned


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables co-bucketed on the join key must join with ZERO
    Exchange nodes — the shuffle the bucketing amortized away."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    # Force the join down the sort-merge path (the sides are tiny at
    # sf0.001, so the planner would otherwise broadcast and the
    # bucketing claim would be vacuous).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "li_b", "o_b", on=["l_orderkey"]).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        # One Exchange for the final groupBy is expected; the JOIN
        # itself must contribute none. Compare against the unbucketed
        # plan, which shuffles both join sides (3 exchanges total).
        unbucketed = (
            li.join(o, on="l_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert A.shuffle_count(j) == 1, A.formatted_plan(j)
        assert A.shuffle_count(unbucketed) == 3
        # Same answer either way.
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, unbucketed.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partition_recovery_msck(spark, sf_dir, tmp_path):
    """Write field=value dirs, register an external partitioned table,
    recover partitions, and read through the catalog with pruning."""
    out = str(tmp_path / "city_cat")
    city = city_shaped_events(spark, sf_dir)
    write_partitioned(city, out, "c_date", fmt="orc")

    spark.sql(
        f"""CREATE TABLE city_cat (ref BIGINT, city_id BIGINT, city_name STRING)
            USING ORC PARTITIONED BY (c_date STRING) LOCATION '{out}'"""
    )
    try:
        # Freshly registered partitioned table knows no partitions yet.
        assert spark.table("city_cat").count() == 0
        spark.sql("MSCK REPAIR TABLE city_cat")
        assert spark.table("city_cat").count() == city.count()
        n_parts = spark.sql("SHOW PARTITIONS city_cat").count()
        assert n_parts == city.select("c_date").distinct().count()
        one_date = city.select("c_date").orderBy("c_date").first().c_date
        got = spark.table("city_cat").filter(F.col("c_date") == one_date).count()
        assert got == city.filter(F.col("c_date") == one_date).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS city_cat")


def test_analyze_table_records_stats_and_cbo_reads_them(spark, sf_dir, tmp_path):
    """ANALYZE TABLE must record rowCount + sizeInBytes in the catalog
    and column NDVs must be queryable — the statistics the CBO's join
    reorder/broadcast estimates consume."""
    from flink_hiveorc_spark.catalog import load_table
    from flink_hiveorc_spark.sinks.bucketed import analyze_table

    spark.sql("DROP TABLE IF EXISTS stats_probe")
    load_table(spark, sf_dir, "nation").write.saveAsTable("stats_probe")
    try:
        out = analyze_table(spark, "stats_probe", columns=["n_nationkey", "n_regionkey"])
        assert out["statistics"] and "25 rows" in out["statistics"]  # e.g. "1274 bytes, 25 rows"
        ndv = spark.sql(
            "DESCRIBE EXTENDED stats_probe n_nationkey"
        ).collect()
        info = {r.info_name: r.info_value for r in ndv}
        assert info.get("distinct_count") == "25"
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_probe")
