"""Public expression library — the engine's reusable Column functions.

One import surface for users composing their own queries:

    from gomaxscale_spark.functions import cosine, jaccard, tokenize, ...

Everything here is a pure Column→Column expression (JVM-side, codegen);
nothing touches the driver.
"""

from .expressions import (  # noqa: F401
    bucketize,
    cosine,
    dot,
    epoch_us,
    fingerprint,
    jaccard,
    language_id,
    lit_vec,
    norm,
    pii_counts,
    punct_ratio,
    quality_score,
    redact_pii,
    stopword_ratio,
    token_count,
    tokenize,
    word_shingles,
)
