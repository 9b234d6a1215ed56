"""warcsum_spark — a PySpark-native re-implementation of the arcalex/warcsum
WARC digest/dedup pipeline, fused with a from-scratch URL-frontier + fetch
scheduler, plus training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md): the reference is a four-stage single-threaded C
dataflow (digest manifest → sort → collision resolution → copy numbering).
We re-express *what it computes* as declarative DataFrame plans so Catalyst
and Tungsten choose the physical strategy; Python appears only inside
Arrow-vectorized UDF batches (WARC member parsing, URL canonicalization),
never per-row.

Layout:
    sources/    — WARC .warc.gz member scan, web_pages table, text manifests
    functions/  — scalar column functions: digests, base32, URLs, text stats
    operators/  — digest manifest, collision resolution, copy numbering,
                  dedup family, similarity search, multimodal plumbing
    plans/      — fused end-to-end pipelines
    frontier/   — URL-frontier: canonicalize → seen-set → robots →
                  politeness → superstep, with checkpoint/resume
    streaming/  — Structured Streaming lift of the stateless digest stage
"""

__version__ = "0.1.0"

from warcsum_spark.session import get_spark  # noqa: F401
