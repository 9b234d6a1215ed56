"""Benchmark runner (driver contract + scaling protocol).

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

``--scaling`` mode: run the same job at local[8] and local[32] on identical
input and write throughput + efficiency to BENCH/BASELINE.md — the sandbox
stand-in for BASELINE.json's N→4N executor criterion (no real cluster
here; see BASELINE.md "Sandbox measurement protocol").

Each query is forced end-to-end with the noop sink (full execution, no
driver collect). Timing excludes session startup; a warmup query primes
the JVM/Arrow workers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402

HEADLINE = [
    "doc_digest_manifest",
    "doc_dedup_extended",
    "pricing_agg",
    "window_events",
    "join_segments",
    "topk_per_user",
    "exact_dedup_docs",
    "minhash_lsh_docs",
    "text_stats",
    "ann_bruteforce",
    "frontier_schedule",
    "url_seen_gate",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    qs = entry_mod.queries()
    times: dict[str, float] = {}
    # warmup: JVM + Arrow python workers
    _force(qs["pricing_agg"](spark, sf_dir))
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def _session(cores: int | str, shuffle: int):
    from warcsum_spark.session import get_spark

    return get_spark(cores=cores, shuffle_partitions=shuffle, app_name=f"bench_{cores}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
        return

    spark = _session(cpus, max(int(cpus), 8))
    times = run_suite(spark, sf_dir)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"headline query suite wall-clock at sf={sf} on local[{cpus}]",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


def run_scaling(sf_dir: str) -> None:
    """Same job at two parallelism levels → throughput + efficiency."""
    from pyspark.sql import SparkSession

    results = {}
    n_rows = None
    for cores in (8, 32):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = _session(cores, cores)
        if n_rows is None:
            n_rows = sum(
                spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
                for t in ("documents", "events", "lineitem", "embeddings", "orders")
            )
        times = run_suite(spark, sf_dir)
        total = sum(times.values())
        results[cores] = {"times": times, "total_sec": round(total, 3),
                         "rows_per_sec": round(n_rows / total, 1)}
        spark.stop()
    eff = (results[8]["total_sec"] / results[32]["total_sec"]) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("# BENCH/BASELINE — scaling protocol results\n\n")
        f.write(
            f"Input: `{sf_dir}` ({n_rows} rows across documents/events/"
            "lineitem/embeddings/orders).\n"
            "Same headline suite, identical input, two parallelism levels\n"
            "(sandbox stand-in for the N→4N executor criterion; "
            "target efficiency >= 0.8).\n\n"
        )
        f.write("| level | total sec | rows/sec |\n|---|---|---|\n")
        for cores in (8, 32):
            r = results[cores]
            f.write(f"| local[{cores}] | {r['total_sec']} | {r['rows_per_sec']} |\n")
        f.write(f"\n**Scaling efficiency (T8/T32)/4 = {eff:.3f}**\n\n")
        f.write("Per-query seconds:\n\n| query | local[8] | local[32] |\n|---|---|---|\n")
        for name in HEADLINE:
            f.write(
                f"| {name} | {results[8]['times'][name]} | {results[32]['times'][name]} |\n"
            )
    print(json.dumps({"scaling_efficiency": round(eff, 3), **{
        f"local{c}_total_sec": results[c]["total_sec"] for c in (8, 32)
    }}))


if __name__ == "__main__":
    main()
