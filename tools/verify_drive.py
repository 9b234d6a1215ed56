"""The /verify skill's build-and-drive recipe as a one-shot script:
run the full warcsum pipeline end-to-end on seeded .warc.gz fixtures
through the public API and smoke the driver contract. Exits non-zero
on any deviation from the pinned seed-42 expectations."""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from warcsum_spark import get_spark  # noqa: E402
from warcsum_spark.fixtures import write_warc_archives  # noqa: E402
from warcsum_spark.operators.collres import extended_text  # noqa: E402
from warcsum_spark.operators.stats import run_stats  # noqa: E402
from warcsum_spark.plans.pipeline import warcsum_pipeline  # noqa: E402


def main() -> int:
    d = tempfile.mkdtemp()
    write_warc_archives(d)
    spark = get_spark(cores=8, shuffle_partitions=8)
    ext = warcsum_pipeline(spark, d)
    rows = extended_text(ext).take(3)
    assert rows and all(r["line"] for r in rows), rows
    stats = run_stats(ext)
    assert stats["total"] == 210, stats
    assert stats["unique"] == 157 and stats["duplicates"] == 53, stats

    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0, "entry() returned no rows"
    print(f"VERIFY OK: pipeline stats={stats}, entry rows={n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
