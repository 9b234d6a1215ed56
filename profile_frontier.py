"""One-off: per-substage timing of the bench frontier stage at a given
core count (pinned, same protocol as bench.py --scaling). Not part of the
driver contract — a profiling aid; delete freely.

Usage: python profile_frontier.py <cores>
"""

import os
import sys
import time

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.sched_setaffinity(0, set(range(cores)))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import SCALE_REPS, _scaling_input, _session  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from warcsum_spark.frontier.politeness import schedule_per_host  # noqa: E402
from warcsum_spark.frontier.seen import filter_unseen  # noqa: E402
from warcsum_spark.functions.urls import canonicalize_url, url_host_canonical  # noqa: E402

spark = _session(cores, 4 * cores)
input_path = _scaling_input(spark, os.environ.get("WARCSUM_BENCH_DIR", "/dev/shm/warcsum_bench"))
pages = spark.read.parquet(input_path).repartition(128)
amplified = (
    pages.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(SCALE_REPS - 1))))
    .withColumn("uri", F.concat_ws("/", "url", F.col("rep").cast("string")))
)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def sub_canon():
    return (
        amplified.select(
            canonicalize_url(F.col("uri")).alias("url"),
            (F.pmod(F.xxhash64("uri"), F.lit(1000)) / 1000.0).alias("priority"),
            F.col("rep"),
        )
        .filter(F.col("url").isNotNull())
        .withColumn("host", url_host_canonical(F.col("url")))
    )


def run(name, fn, trials=3):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>24}: {best:7.3f}s  load={os.getloadavg()[0]:.1f}")
    return best


# warmup
_force(sub_canon().limit(1000))

run("canonicalize+host", lambda: _force(sub_canon()))

cand = sub_canon().localCheckpoint(eager=False)
run("ckpt(materialize)", lambda: _force(cand))

seen = cand.filter(F.col("rep") % 2 == 0).select("url")
run("anti-join(seen)", lambda: _force(filter_unseen(cand, seen)))

unseen = filter_unseen(cand, seen)
run(
    "politeness topk",
    lambda: _force(
        schedule_per_host(unseen, politeness=None, default_budget=50, salt_buckets=16)
    ),
)
spark.stop()
