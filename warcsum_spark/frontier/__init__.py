"""URL-frontier + fetch scheduler (north_rule; no reference counterpart).

Iterative-batch supersteps over Iceberg/parquet state: canonicalize →
URL-seen gate (exact anti-join + per-partition bloom short-circuit) →
robots gate → per-host politeness top-k → schedule → discover → checkpoint.
"""
