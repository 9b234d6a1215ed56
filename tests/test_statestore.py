"""StateStore seam (frontier/statestore.py): the crawl loop must be
persistence-agnostic — parquet store resume matches the simulator, and
the Iceberg implementation's MERGE-INTO/snapshot SQL has the mapped
shape (execution needs a catalog this sandbox lacks; the constructor
must say so instead of failing mid-write)."""

from __future__ import annotations

import pytest

from test_frontier import _fixture_dfs
from warcsum_spark.frontier.statestore import (
    IcebergStateStore,
    ParquetDirectoryStore,
    StateStore,
    create_pending_table_sql,
    create_seen_table_sql,
    merge_seen_sql,
    overwrite_pending_sql,
    run_crawl,
)
from warcsum_spark.frontier.superstep import (
    frontier_round,
    init_frontier,
    scheduled_order,
)
from warcsum_spark.oracle import simulate_crawl


def test_run_crawl_through_store_resumes_like_uninterrupted(spark, tmp_path):
    (seeds, link_graph, budgets, robots, seeds_df, lg_df, pol_df, robots_df) = (
        _fixture_dfs(spark)
    )
    sim = simulate_crawl(seeds, link_graph, budgets, robots, rounds=4)

    store = ParquetDirectoryStore(spark, str(tmp_path / "ckpt"))
    assert isinstance(store, StateStore)
    assert store.newest_round() is None

    state = init_frontier(spark, seeds_df)
    run_crawl(
        spark, store, state, lg_df, n_rounds=2,
        robots=robots_df, politeness=pol_df,
    )
    assert store.newest_round() == 2

    resumed = store.load()
    for rnd in (2, 3):
        resumed, scheduled = frontier_round(
            spark, resumed, lg_df, robots=robots_df, politeness=pol_df
        )
        assert scheduled_order(scheduled) == sim.scheduled_per_round[rnd], rnd


def test_iceberg_sql_shapes():
    """The generated SQL is the documented Iceberg mapping: bucket(N,host)
    partition transform, idempotent WHEN-NOT-MATCHED seen upsert, atomic
    INSERT OVERWRITE pending snapshot stamped with the round."""
    pend = create_pending_table_sql("cat.db.crawl_pending", host_hash_buckets=128)
    assert "USING iceberg" in pend
    assert "PARTITIONED BY (bucket(128, host))" in pend

    seen = create_seen_table_sql("cat.db.crawl_seen")
    assert "USING iceberg" in seen

    merge = merge_seen_sql("cat.db.crawl_seen", "src")
    assert "MERGE INTO cat.db.crawl_seen" in merge
    assert "WHEN NOT MATCHED THEN INSERT" in merge
    assert "ON t.url = s.url" in merge
    assert "WHEN MATCHED" not in merge  # pure insert-if-absent: idempotent

    over = overwrite_pending_sql("cat.db.crawl_pending", "src", round_no=7)
    assert "INSERT OVERWRITE cat.db.crawl_pending" in over
    assert "7 AS round_no" in over


def test_iceberg_store_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        IcebergStateStore(spark, "nonexistent_catalog", "crawl")


def test_run_crawl_commits_the_tail_round(spark, tmp_path):
    """n_rounds not a multiple of checkpoint_every: the final round must
    still land in the store, or a resume would silently replay it."""
    (_, _, _, _, seeds_df, lg_df, pol_df, robots_df) = _fixture_dfs(spark)
    store = ParquetDirectoryStore(spark, str(tmp_path / "ckpt2"))
    state = init_frontier(spark, seeds_df)
    run_crawl(
        spark, store, state, lg_df, n_rounds=3, checkpoint_every=2,
        robots=robots_df, politeness=pol_df,
    )
    assert store.newest_round() == 3
