"""One-off: dedup-stage knob sweep at a given core count (pinned) — probes
the 8→32 anti-scaling (shuffle partitions, compression, window path).
Profiling aid; delete freely. Usage: python profile_dedup32.py <cores>
"""

import os
import sys
import time

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
os.sched_setaffinity(0, set(range(min(cores, os.cpu_count()))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import SCALE_REPS, _scaling_input, _session  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from warcsum_spark.operators.collres import resolve_collisions  # noqa: E402


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def run(spark, name, fn, trials=3):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best:7.3f}s  load={os.getloadavg()[0]:.1f}")


def manifest(spark, input_path):
    pages = spark.read.parquet(input_path).repartition(128)
    amp = pages.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(SCALE_REPS - 1)))
    ).withColumn(
        "payload", F.concat(F.col("html"), F.encode(F.col("rep").cast("string"), "UTF-8"))
    ).withColumn("uri", F.concat_ws("/", "url", F.col("rep").cast("string")))
    return amp.select(
        F.lit("bench").alias("warcfile"),
        F.monotonically_increasing_id().alias("offset"),
        F.length("payload").alias("length"),
        F.col("uri"),
        F.lit("-").alias("date"),
        F.substring(F.sha1("payload"), 1, 6).alias("digest"),
        F.col("payload"),
    )


spark = _session(cores, 4 * cores)
input_path = _scaling_input(spark, os.environ.get("WARCSUM_BENCH_DIR", "/dev/shm/warcsum_bench"))
m = manifest(spark, input_path)
_force(m.limit(1000))

# upstream alone (hashing + id, no shuffle)
run(spark, "manifest_map_only", lambda: _force(m))
# full dedup at session default partitions
run(spark, f"dedup_shuffle{4*cores}", lambda: _force(resolve_collisions(m, content_key="fingerprint")))
# explicit partition counts
for parts in (64, 256):
    run(
        spark,
        f"dedup_parts{parts}",
        lambda p=parts: _force(
            resolve_collisions(m, content_key="fingerprint", num_partitions=p)
        ),
    )
spark.stop()
