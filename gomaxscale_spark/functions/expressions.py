"""Reusable Column expressions re-exported from the operator modules,
plus a few standalone helpers used across the catalog."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..operators.dedup import jaccard, tokenize, word_shingles  # noqa: F401
from ..operators.similarity import cosine, dot, lit_vec, norm  # noqa: F401
from ..operators.text import (  # noqa: F401
    fingerprint,
    language_id,
    pii_counts,
    punct_ratio,
    quality_score,
    redact_pii,
    stopword_ratio,
    token_count,
)


def epoch_us(ts_col: Column) -> Column:
    """Exact epoch microseconds of a timestamp column — the engine's
    canonical comparison domain for event time (ns parquet truncates to
    µs everywhere; see catalog.py)."""
    return F.unix_micros(ts_col.cast("timestamp"))


def bucketize(value: Column, width: float, max_bucket: int | None = None) -> Column:
    """Fixed-width bucket id for range-join equi-joinization and
    histograms (floor(value/width), optionally capped)."""
    b = F.floor(value / F.lit(width)).cast("long")
    if max_bucket is not None:
        b = F.least(b, F.lit(max_bucket).cast("long"))
    return b
