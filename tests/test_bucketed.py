"""sources/bucketed.py — co-located joins must be exchange-free at the
plan level, and the layout must not change join results."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.sources.bucketed import read_table, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("url_id"), (F.col("id") % 97).alias("host_id")
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("url_id"), F.sha1(F.col("id").cast("string")).alias("digest")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real (non-broadcast) join so the exchange question is live
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(left, "wb_left", "url_id", n_buckets=8)
        write_bucketed(right, "wb_right", "url_id", n_buckets=8)
        joined = read_table(spark, "wb_left").join(
            read_table(spark, "wb_right"), "url_id"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan

        # and the shuffle-free plan returns the right answer
        assert joined.count() == 5_000
        got = {r["url_id"]: r["digest"] for r in joined.limit(50).collect()}
        assert all(v is not None for v in got.values())

        # contrast: the same join over plain (unbucketed) frames shuffles
        plain = left.join(right, "url_id")
        assert "Exchange hashpartitioning" in _plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS wb_left")
        spark.sql("DROP TABLE IF EXISTS wb_right")


def test_bucketed_groupby_has_no_exchange(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 50).alias("host_id"), F.col("id").alias("url_id")
    )
    try:
        write_bucketed(df, "wb_hosts", "host_id", n_buckets=8)
        agg = read_table(spark, "wb_hosts").groupBy("host_id").agg(
            F.count("*").alias("n")
        )
        plan = _plan(agg)
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS wb_hosts")
