"""T71 — revisit-record resolution: the READ side of T57's dedup-aware
WARC sink. A deduplicated archive stores each payload once (first
capture = full ``response`` record) and every later capture as a
payload-less ``revisit`` record (WARC 1.1 §6.7.2, identical-payload-
digest profile). Any consumer that wants the page bytes back — replay,
re-extraction, retraining — must re-attach each revisit to its stored
original. This operator rehydrates a scanned archive set
(sources/warc.py::scan_warc_members frame, or any frame with the same
columns) into the logical view where every capture carries its payload.

Resolution is keyed on the PAYLOAD DIGEST, not on Refers-To headers:
under the identical-payload-digest profile the digest IS the payload's
name (the Refers-To pair is informational), which makes the join a
plain digest-keyed hash equi-join — the same key the reference's
collision-resolution stage shuffles on (warccollres.h:30–36), so at
production scale both stages share one bucketing of the archive store.

Plan shape:

* Originals collapse to ONE row per digest with the T57 first-capture
  rule (min (date, uri) — revisit_writer.plan_revisits:69) via a
  single digest-keyed window; tolerant of archives written before
  dedup (several responses per digest).
* Revisits join that collapsed side on the digest key — one hash
  exchange each side, no skew (a digest's revisit count is the cluster
  size, bounded by the dedup policy).
* Responses pass through untouched; revisits whose original is absent
  from the scanned set (cross-collection reference) keep their empty
  payload with ``resolved = false`` — the caller decides whether to
  range-fetch them (sources/fetch.py) or drop them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESOLVE_COLS = ("resolved", "ref_uri", "ref_date")


def resolve_revisits(
    members: DataFrame,
    type_col: str = "warc_type",
    algo_col: str = "stored_algo",
    digest_col: str = "stored_digest_b32",
    uri_col: str = "uri",
    date_col: str = "date",
    payload_col: str = "payload",
) -> DataFrame:
    """Input columns + (resolved boolean, ref_uri, ref_date).

    ``revisit`` rows come back with ``payload`` replaced by the first
    capture's payload and (ref_uri, ref_date) naming it; unresolvable
    revisits keep their payload with resolved = false. Every other row
    (responses, metadata, conversion records) passes through with
    resolved = true and null refs. Rows with a null digest are never
    join candidates."""
    for c in _RESOLVE_COLS:
        if c in members.columns:
            raise ValueError(f"column {c!r} already present in input")
    key = F.when(
        F.col(digest_col).isNotNull(),
        F.concat_ws(":", F.col(algo_col), F.col(digest_col)),
    )
    m = members.withColumn("_k", key)

    # payload IS NOT NULL, not length > 0: a genuinely zero-length
    # original (empty body / 204-style capture) is still the payload a
    # revisit refers to — excluding it would report resolved = false
    # with the original present in the scanned set
    responses = m.filter(
        (F.col(type_col) == "response") & F.col(payload_col).isNotNull()
    )
    w = Window.partitionBy("_k").orderBy(
        F.col(date_col).asc(), F.col(uri_col).asc()
    )
    firsts = (
        responses.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "_k",
            F.col(payload_col).alias("_ref_payload"),
            F.col(uri_col).alias("_ref_uri"),
            F.col(date_col).alias("_ref_date"),
            # explicit match flag: resolved must be true even when the
            # matched original's payload is empty bytes
            F.lit(True).alias("_matched"),
        )
    )

    revisits = m.filter(F.col(type_col) == "revisit")
    out_cols = members.columns
    resolved_revisits = (
        revisits.join(firsts, "_k", "left")
        .withColumn(
            payload_col,
            F.coalesce(F.col("_ref_payload"), F.col(payload_col)),
        )
        .select(
            *out_cols,
            F.coalesce(F.col("_matched"), F.lit(False)).alias("resolved"),
            F.col("_ref_uri").alias("ref_uri"),
            F.col("_ref_date").alias("ref_date"),
        )
    )
    passthrough = m.filter(
        F.col(type_col).isNull() | (F.col(type_col) != "revisit")
    ).select(
        *out_cols,
        F.lit(True).alias("resolved"),
        F.lit(None).cast("string").alias("ref_uri"),
        F.lit(None).cast("string").alias("ref_date"),
    )
    return passthrough.unionByName(resolved_revisits)
