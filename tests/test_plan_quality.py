"""Physical-plan regression gates: the plans we designed for must stay the
plans we get (SURVEY §4) — single exchange for the dedup windows, parquet
filter pushdown, broadcast joins for small dims, cluster-preserving
partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcsum_spark.operators.collres import resolve_collisions


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _manifest(spark, n=200):
    rows = [
        ("f.warc.gz", i, 10, f"http://h/{i}", "2015-01-01", f"sha1:{i % 37:02x}", bytes([i % 11]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "warcfile string, offset long, length long, uri string, date string, "
        "digest string, payload binary",
    )


def test_collres_single_exchange(spark):
    """All three dedup windows must share ONE hash exchange on digest —
    the whole 4-stage pipeline's only wide boundary (SURVEY §3.3)."""
    plan = _plan(resolve_collisions(_manifest(spark)))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, plan has {n_exchanges}:\n{plan[:3000]}"


def test_parquet_filter_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")).select(
        "l_returnflag", "l_quantity"
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: html-sized columns never read
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_broadcast_join_for_small_dim(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_digest_clusters_never_straddle_partitions(spark):
    """O2 parity: warcsumsplit's cluster-preserving split (warcsumsplit:150
    –231) holds by construction under hash partitioning."""
    df = _manifest(spark, 500).repartition(7, "digest").withColumn(
        "pid", F.spark_partition_id()
    )
    bad = (
        df.groupBy("digest")
        .agg(F.count_distinct("pid").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert bad == 0
