"""Text analysis for training-data pipelines: token stats, quality
scoring, language identification, document fingerprinting.

All row-local (embarrassingly parallel maps): quality/fingerprint are
pure codegen expressions; language-ID is a small literal-profile scorer.
At 100 TB these cost one scan with full column pruning (only ``text``
is read) and no shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokenize
from .materialize import materialize_once

#: Vocabulary row-count cap under which the iterated BPE rounds run as
#: one driver-side Python loop over the collected vocabulary instead of
#: K sequential (pair-agg + 1-row argmax collect + fold + persist)
#: Spark rounds (r17 optimization round, guide §8 "decide with small
#: rows" / §5 driver discipline — the runtime size decision of the r16
#: SPARK_GRAFT_CC_SMALL_EDGES union-find path). The arithmetic is
#: integer counts and string concatenation — EXACT in both paths, so
#: unlike a float kernel the two paths are bit-identical by
#: construction (pinned by a forced both-paths equivalence test).
#: 2¹⁶ (w, wc, toks) rows ≈ a few MB collected; a 100 TB corpus's
#: vocabulary (~10⁸ words) stays far above the cap and runs the
#: distributed rounds unchanged.
BPE_SMALL_VOCAB_ROWS = 1 << 16

#: A tiny English-ish stopword list (deterministic, matches the synthetic
#: corpus vocabulary).
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")

#: Character-bigram profiles for a toy language-ID heuristic. Public
#: n-gram-frequency approach (Cavnar & Trenkle '94 style), profiles kept
#: deliberately tiny; real deployments would load larger profiles as a
#: broadcast lookup table.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "de": ("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "er", "te", "el"),
    "es": ("de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "re"),
    "pt": ("de", "os", "ar", "es", "ra", "ad", "en", "co", "nt", "ao"),
}


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    cleaned = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(text) > 0, F.length(cleaned).cast("double") / F.length(text).cast("double")
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = tokenize(F.lower(text))
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(
        F.size(toks) > 0, sw.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]:
    0.4·length-score + 0.3·stopword-presence + 0.3·(1 − punct-ratio).

    Length score saturates at 200 tokens (≈ a solid paragraph). The
    formula uses only +,*,min — deterministic and oracle-expressible.
    """
    ln = F.least(token_count(text).cast("double") / F.lit(200.0), F.lit(1.0))
    sw = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    pr = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    return F.round(F.lit(0.4) * ln + F.lit(0.3) * sw + F.lit(0.3) * pr, 6)


def language_scores(text: Column) -> Column:
    """Map of lang → matched-profile-bigram count over the text."""
    lower = F.lower(text)
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_PROFILES]),
        F.array(
            *[
                F.aggregate(
                    F.array(*[F.lit(bg) for bg in profile]),
                    F.lit(0),
                    lambda acc, bg: acc
                    + F.when(F.contains(lower, bg), F.lit(1)).otherwise(F.lit(0)),
                )
                for profile in LANG_PROFILES.values()
            ]
        ),
    )


def language_id(text: Column) -> Column:
    """argmax over LANG_PROFILES scores; ties broken by profile order.

    A deterministic n-gram-presence heuristic — the Spark-side plumbing
    (literal profiles, aggregate fold, argmax) is the real deliverable;
    swap in full trigram frequency profiles for production accuracy.
    """
    scores = language_scores(text)
    langs = list(LANG_PROFILES)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition signals per document: duplicate-token
    ratio (1 − distinct/total) and top-token ratio (most frequent token
    / total). High values flag boilerplate / degenerate text — the
    standard pre-training repetition filters (Rae et al. 2021, §A1.1).

    Shape: explode → two hash aggregations keyed by doc. Scale: the
    (doc_id, token) partial agg combines map-side, so the shuffle
    carries one row per distinct (doc, token), never raw token streams;
    everything stays JVM-side.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(F.lower(F.col(text_col)))).alias("tok"),
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
        ).alias("dup_token_ratio"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top_token_ratio"
        ),
    )


def ngram_char_repetition(df, id_col: str, text_col: str, ns=(2, 3, 5, 8)):
    """Char-mass n-gram repetition signals per (document, n) — the
    CHARACTER-level half of Gopher's repetition battery (Rae et al.
    2021 §A1.1; `repetition_stats` covers the token-level half):

    - ``top_gram_char_frac`` — the largest character mass any single
      n-gram's occurrences cover, / the doc's total gram-occurrence
      char mass (Gopher thresholds the "most frequent n-gram" — we
      rank by char mass c·len directly, which is tie-stable across
      engines and is the quantity the filter actually cares about);
    - ``dup_gram_char_frac`` — char mass of all DUPLICATED n-grams'
      occurrences / total gram-occurrence char mass (the
      occurrence-mass form of Gopher's duplicated-n-gram fraction —
      exact, no overlap-merging pass).

    A gram's char length counts token characters only (no separators);
    docs shorter than n tokens emit no row for that n (same on the
    oracle side). Scale: token text is hashed ONCE per token; grams
    for every n come off one projected (hash, len) struct array via
    O(1) element_at lookups (the shingle_hash_rows lesson — never a
    slice copy, never re-tokenizing); the exploded stream carries
    (doc_id, n, 8-byte gram hash, int char len) — gram STRINGS never
    exist at all — through two partial-agged hash aggregations. At
    100 TB: same shape as `repetition_stats`, one row per distinct
    (doc, n, gram) after the map-side combine.
    """
    from .dedup import parallelize_narrow_input

    base = parallelize_narrow_input(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.transform(
            tokenize(F.col(text_col)),
            lambda t: F.struct(
                F.xxhash64(t).alias("h"), F.length(t).alias("l")
            ),
        ).alias("__th"),
    )
    th = F.col("__th")
    gram_t = "array<struct<n:int,gh:bigint,clen:int>>"

    def gram_at(n):
        # closure factory, NOT a default-arg lambda: a two-parameter
        # lambda would make PySpark pass the transform INDEX as the
        # second argument
        def build(k):
            return F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(
                    *[F.element_at(th, k + i)["h"] for i in range(n)]
                ).alias("gh"),
                sum(
                    [F.element_at(th, k + i)["l"] for i in range(1, n)],
                    F.element_at(th, k)["l"],
                ).alias("clen"),
            )

        return build

    per_n = []
    for n in ns:
        per_n.append(
            F.when(
                F.size(th) >= n,
                F.transform(F.sequence(F.lit(1), F.size(th) - n + 1), gram_at(n)),
            ).otherwise(F.array().cast(gram_t))
        )
    rows = base.select(
        F.col(id_col), F.explode(F.flatten(F.array(*per_n))).alias("g")
    ).select(F.col(id_col), F.col("g.n"), F.col("g.gh"), F.col("g.clen"))
    cnt = rows.groupBy(id_col, "n", "gh").agg(
        F.count(F.lit(1)).alias("c"), F.max("clen").alias("clen")
    )
    mass = F.sum(F.col("c") * F.col("clen"))
    return cnt.groupBy(id_col, "n").agg(
        F.sum("c").alias("n_grams"),
        F.round(F.max(F.col("c") * F.col("clen")).cast("double") / mass, 6).alias(
            "top_gram_char_frac"
        ),
        F.round(
            F.sum(
                F.when(F.col("c") >= 2, F.col("c") * F.col("clen")).otherwise(0)
            ).cast("double")
            / mass,
            6,
        ).alias("dup_gram_char_frac"),
    )


#: Gopher rule battery literals (Rae et al. 2021 §A1.1 adapted):
#: thresholds are PLAN LITERALS so the oracle replays the same rules.
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3.0, 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(df, id_col: str, text_col: str):
    """Gopher quality-rule battery per document (Rae et al. 2021
    §A1.1, the thresholds adapted to this corpus's scale): word count
    in [50, 100k], mean word length in [3, 10], ≥80% of words contain
    an alphabetic character, ≥2 stopword hits. Emits the measured
    signals plus per-rule booleans and the conjunction ``passes`` —
    the shape a filtering pipeline joins on or aggregates for a
    dataset card. Pure map: one projection, zero shuffle at any
    corpus size.
    """
    toks = tokenize(F.col(text_col))
    n_words = F.size(toks)
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
        ).cast("double")
        / n_words,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / n_words,
        6,
    )
    stop_hits = F.size(
        F.filter(
            toks, lambda t: F.lower(t).isin(*GOPHER_STOPWORDS)
        )
    )
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_len = (mean_len >= GOPHER_MIN_MEAN_LEN) & (mean_len <= GOPHER_MAX_MEAN_LEN)
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    r_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        r_words.alias("rule_word_count"),
        r_len.alias("rule_mean_len"),
        r_alpha.alias("rule_alpha_frac"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_len & r_alpha & r_stop).alias("passes"),
    )


FINGERPRINT_MOD = 2_147_483_647  # 2³¹−1 (Mersenne prime) — keeps the fold in long range


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over whitespace tokens:
    h = Σ fold (h·31 + len(tok) + codepoint(tok[0])) mod 2³¹−1.

    Deterministic, order-sensitive (unlike MinHash), cheap — the classic
    content-defined fingerprint for incremental re-crawl detection. Pure
    `aggregate` fold → codegen, no shuffle.
    """
    return F.aggregate(
        tokenize(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.length(t) + F.ascii(t)) % FINGERPRINT_MOD,
    )


#: PII patterns kept to the regex subset that Java (Spark) and RE2
#: (DuckDB, the oracle engine) evaluate identically — no backrefs, no
#: lookaround. Order matters: emails are redacted before IPs so the
#: host part of an address never half-matches.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\d{3}-\d{3}-\d{4}"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
)


def pii_counts(text: Column) -> list[Column]:
    """One match-count column per PII class (codegen regexp, no shuffle)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder token.

    Scale: a pure per-row map — chained regexp_replace stays inside
    whole-stage codegen; at 100 TB this is one scan, no shuffle, and
    column pruning reads only ``text``.
    """
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def benchmark_contamination(
    corpus, bench, id_col: str, text_col: str, n: int = 4
):
    """Benchmark decontamination: per corpus document, the fraction of
    its distinct word n-grams that appear anywhere in the benchmark set
    (the standard pre-training eval-leakage check, e.g. GPT-3 appendix C
    style 13-gram overlap; n is configurable).

    Scale: the benchmark side is SMALL by construction (eval suites are
    thousands of docs, not billions) → its distinct n-gram set is
    broadcast; the corpus side explodes to (doc_id, n-gram) rows that
    join map-side with no shuffle of raw documents. The one shuffle is
    the per-doc count aggregation (partial agg → one row per doc per
    partition). For benchmark sets too large to broadcast, drop the
    hint: the join degrades to shuffle-hash on the n-gram key.
    """
    from .bucketing import parallelize_narrow_input
    from .dedup import word_shingles

    bench_ngrams = (
        bench.select(F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    expl = parallelize_narrow_input(corpus.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    return (
        expl.join(F.broadcast(bench_ngrams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("__hit").alias("hits"),
            F.count(F.lit(1)).alias("total_ngrams"),
        )
        .withColumn(
            "contamination", F.round(F.col("hits") / F.col("total_ngrams"), 6)
        )
    )


# ------------- hashed bigram-LM perplexity scoring (CCNet-style) ------
#
# The perplexity quality filter (Wenzek et al. 2020, CCNet; also the
# Gopher/MassiveText pipeline): score every document by the average
# log-probability a reference-corpus language model assigns to it, and
# filter/partition the corpus on that score. The LM here is a hashed
# BIGRAM model with add-1 smoothing — the Spark-expressible stand-in
# for KenLM (same pipeline role, engine-portable math; a production
# deployment would swap the scorer UDF, not the plan).
#
# Engine parity reuses the DSIR discipline (operators/sampling.py):
# each bigram's log-prob is quantized to integer MICRO-NATS right
# after the (same-expression, integer-input) ln calls, so the per-doc
# aggregation is order-independent BIGINT arithmetic.

#: Per-side hash buckets for the bigram LM. 256 keeps the full
#: conditional table ≤ 256² = 65,536 rows — broadcastable by
#: construction at ANY corpus scale (the table size is a function of
#: the hash space, not the corpus).
PPL_BUCKETS = 256


def bigram_logprob_micro(
    df,
    id_col: str,
    text_col: str,
    reference,
    n_buckets: int = PPL_BUCKETS,
):
    """Per-document hashed-bigram LM score: (id, n_bigrams, lp_micro,
    avg_logprob) where lp_micro = Σ round(1e6 · ln p̂(b₂|b₁)) over the
    doc's token bigrams, p̂ add-1-smoothed from the ``reference`` slice
    (a boolean Column over df's rows — the trusted corpus the LM is
    trained on), and avg_logprob = round(lp_micro/1e6/n_bigrams, 6).
    Documents with fewer than 2 tokens get no row (no bigrams to
    score) — keep them upstream if needed.

    Scale: bigram rows carry (id, packed 2-byte×2 key); the conditional
    LM (≤ n_buckets² rows) and the context-count table (n_buckets rows)
    are aggregates of the reference slice that BROADCAST back to the
    corpus stream — the score pass is one scan + two broadcast hash
    joins + one partial-agg groupBy(id). Unseen bigrams/contexts fall
    out of the LEFT joins as count 0 (add-1 smoothing handles them in
    the same expression — no special-casing, no lost rows).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    bucketed = F.transform(
        toks,
        lambda tok: F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    base = df.select(
        F.col(id_col),
        bucketed.alias("__b"),
        reference.cast("long").alias("__ref"),
    )
    # (id, key=b1*B+b2, __ref) — one row per bigram occurrence
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(F.col("__b")) >= 2,
                F.expr(
                    "transform(sequence(1, size(__b) - 1),"
                    f" k -> element_at(__b, k) * {n_buckets} + element_at(__b, k + 1))"
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("key"),
        F.col("__ref"),
    )
    from .materialize import materialize_once

    # materialize the bigram stream ONCE (r16 optimization round): the
    # LM-count pass and the score pass used to each re-run the
    # tokenize+md5+bigram explode over the raw corpus; one pass now
    # feeds both through a checkpointed (id, key, flag) frame —
    # ~24 B/bigram, no text
    pairs = materialize_once(pairs)
    # materialize the (≤ n_buckets²)-row conditional LM once and DERIVE
    # the context table from it (Σ_b2 c2(b1,b2) = c1(b1) — the proper
    # conditional denominator, and zero extra corpus scans; counting
    # raw tokens would also be wrong, including document-final tokens
    # that never serve as context). The LM artifact is ≤ 65k rows.
    c2 = materialize_once(
        pairs.filter(F.col("__ref") == 1)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = (
        c2.groupBy(F.floor(F.col("key") / n_buckets).cast("long").alias("b1"))
        .agg(F.sum("c2").alias("c1"))
    )
    scored = (
        pairs.withColumn("b1", F.floor(F.col("key") / n_buckets).cast("long"))
        .join(F.broadcast(c2), "key", "left")
        .join(F.broadcast(c1), "b1", "left")
        .select(
            F.col(id_col),
            F.round(
                (
                    F.log(F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    - F.log(F.coalesce(F.col("c1"), F.lit(0)) + n_buckets)
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_micro").alias("lp_micro"),
    ).select(
        F.col(id_col),
        "n_bigrams",
        "lp_micro",
        F.round(F.col("lp_micro") / 1e6 / F.col("n_bigrams"), 6).alias("avg_logprob"),
    )


# ----------------- Bloom-filter decontamination prefilter (r13) -------
#
# At 100 TB the exact benchmark n-gram set can be too large to ship to
# every task as strings (13-gram suites × many benchmarks = GBs); the
# standard answer is a Bloom filter: k hashed bit positions per gram in
# a fixed m-bit space — the broadcast artifact becomes m/8 bytes
# (128 KB here) whatever the benchmark size, at the price of a
# quantified false-positive rate. Every hash below is the repo's
# portable family (60-bit md5 prefix mod P, Carter-Wegman mixes with
# fixed-seed literal coefficients, bit packing in 60-bit words), so a
# DuckDB oracle replays bit membership — and hence the exact
# false-positive set — bit-for-bit.

#: Bloom geometry: 2^20 positions packed 60 bits/word (shifts stay
#: below 2^60 on both engines), 3 Carter-Wegman probes per gram.
BLOOM_M = 1 << 20
BLOOM_K = 3
BLOOM_WORD_BITS = 60
BLOOM_SEED = 29


def _gram_hash60(g: Column) -> Column:
    """Portable gram key: 60-bit md5 prefix mod P (PORTABLE_TOKEN_HASH
    discipline) — grams hash ONCE, only longs flow through exchanges."""
    from .dedup import MINHASH_P

    return (
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P)
    )


def _bloom_positions(gh: Column) -> list[Column]:
    from .dedup import MINHASH_P, cw_hash_coefficients

    return [
        ((F.lit(a) * gh + F.lit(b)) % F.lit(MINHASH_P)) % F.lit(BLOOM_M)
        for a, b in cw_hash_coefficients(BLOOM_K, seed=BLOOM_SEED)
    ]


def bloom_build(bench, text_col: str, n: int = 4):
    """(word, bits) Bloom filter over the benchmark's distinct word
    n-grams — ≤ ⌈m/60⌉ = 17,477 rows (~140 KB) whatever the benchmark
    size. bit_or packs per-word masks; duplicate positions fold."""
    from .dedup import word_shingles

    grams = bench.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    return bloom_build_from_hashes(
        grams.select(_gram_hash60(F.col("g")).alias("gh"))
    )


def bloom_build_from_hashes(gh_rows: DataFrame) -> DataFrame:
    """``bloom_build`` fed from an already-hashed (gh) gram stream —
    the r17 entry point that lets ``bloom_decontaminate`` build the
    filter off its materialized benchmark gram-hash set instead of
    re-tokenizing the benchmark a second time. Identical bits: the
    positions are a pure function of gh."""
    pos = gh_rows.select(
        F.explode(F.array(*_bloom_positions(F.col("gh")))).alias("pos")
    )
    return (
        pos.select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_decontaminate(
    corpus, bench, id_col: str, text_col: str, n: int = 4
):
    """Per corpus doc: distinct-gram count, EXACT benchmark hits, and
    BLOOM hits (bloom ≥ exact; the difference is the measured
    false-positive cost of shipping 128 KB instead of the gram set).

    Scale: the bloom and the exact gh-set are both broadcast (the
    former fixed-size, the latter 8 B/gram); the corpus side explodes
    to (doc, gh[, pos]) LONG rows — gram strings are hashed once and
    never shuffle; per-gram verdicts fold with bool_and over the k=3
    probe rows; one partial-agged groupBy(doc) ends the plan. The
    production topology: Bloom prefilter everywhere, exact verify only
    on the Bloom-positive slice (here both run corpus-wide so the FP
    rate is measurable and oracle-checked).
    """
    from .bucketing import parallelize_narrow_input
    from .dedup import word_shingles

    # ONE benchmark tokenize pass (r17 optimization round, guide §2.3):
    # the Bloom bits and the exact gh-set previously each re-tokenized
    # the benchmark slice — the filter's positions are a pure function
    # of the same 60-bit gram hashes the exact set stores, so both now
    # derive from one materialized distinct-gh frame (gram-set-sized —
    # bounded by the benchmark, the side the guide already budgets two
    # logical uses for).
    bench_gh_base = materialize_once(
        bench.select(F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .select(_gram_hash60(F.col("g")).alias("gh"))
        .distinct()
    )
    bloom = bloom_build_from_hashes(bench_gh_base)
    bench_gh = bench_gh_base.withColumn("__e", F.lit(1))
    doc_gh = (
        parallelize_narrow_input(corpus.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("g"),
        )
        .select(F.col(id_col), _gram_hash60(F.col("g")).alias("gh"))
        .distinct()
    )
    probes = doc_gh.select(
        F.col(id_col),
        "gh",
        F.explode(F.array(*_bloom_positions(F.col("gh")))).alias("pos"),
    ).select(
        F.col(id_col),
        "gh",
        F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
        F.expr(f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))").alias(
            "mask"
        ),
    )
    gram_hit = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            F.col(id_col),
            "gh",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(False)
            ).alias("hit_j"),
        )
        .groupBy(id_col, "gh")
        .agg(F.expr("bool_and(hit_j)").alias("bloom_hit"))
    )
    per_gram = gram_hit.join(F.broadcast(bench_gh), "gh", "left")
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.sum(F.when(F.col("__e").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("exact_hits"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("long")
            .alias("bloom_hits"),
        )
        .filter(F.col("bloom_hits") > 0)
    )


# ------------------------------------------- sequence assembly (r14):
# the operators between a curated corpus and a training/RAG consumer —
# context-window chunking and tokenizer induction. (Training-sequence
# packing, the third member, lives in operators/sampling.py next to
# the deterministic shuffle whose order it packs.)


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunks per document — the RAG /
    context-window splitter. Returns (id, chunk_id, start_tok,
    n_tokens, chunk_hash): one row per window starting at every
    ``stride`` tokens while tokens remain (the final windows are
    shorter than ``chunk_size``; a chunk starts at each multiple of
    stride < doc length, so every token is covered and consecutive
    chunks overlap by ``chunk_size - stride``). ``chunk_id`` is
    ``start_tok / stride`` — pure arithmetic, no window function.
    ``chunk_hash`` is md5 of the space-joined window: chunk identity
    travels as 32 bytes whatever the window text size.

    Scale: a per-row map + one lateral explode — ZERO exchanges; the
    fan-out is ~n_tokens/stride rows per doc and each carries a fixed-
    width hash, never the window text. Empty docs emit nothing.
    """
    base = df.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size(F.col("__toks")))
    ex = base.filter(F.col("__n") > 0).select(
        F.col(id_col),
        F.col("__toks"),
        F.col("__n"),
        F.explode(
            F.sequence(F.lit(0), F.col("__n") - 1, F.lit(int(stride)))
        ).alias("start_tok"),
    )
    return ex.select(
        F.col(id_col),
        (F.col("start_tok") / F.lit(int(stride)))
        .cast("long")
        .alias("chunk_id"),
        F.col("start_tok").cast("long"),
        F.least(F.lit(int(chunk_size)), F.col("__n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"), F.col("start_tok") + 1, F.lit(int(chunk_size))
                ),
            )
        ).alias("chunk_hash"),
    )


def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Adjacent CHARACTER-pair frequencies within words, weighted by
    corpus word frequency — the statistic whose argmax is byte-pair
    encoding's first merge (Sennrich et al., ACL 2016). Returns the
    top-``k`` (pair, n_occurrences), ordered by count desc then pair.

    Two-stage shape — the reason this scales: stage 1 collapses the
    corpus to its VOCABULARY (word → total count; one hash agg whose
    partials fold map-side), stage 2 explodes character pairs over
    distinct words only — the pair fan-out is vocabulary-sized
    (≤ avg_word_len per distinct word), independent of corpus row
    count. Words are lowercased; 1-char words have no pairs.
    """
    words = (
        df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return pair_counts_from_vocab(words, k)


def pair_counts_from_vocab(words: DataFrame, k: int = 20) -> DataFrame:
    """The pair-count core of ``bpe_pair_counts`` over a PRECOMPUTED
    (w, wc) vocabulary frame — so the streaming vocabulary lake
    (streaming/vocab_lake.py) can serve the identical statistic off
    its committed epoch sums (word counts are additive over disjoint
    document batches, so the lake's summed vocabulary IS the corpus
    vocabulary; batch ≡ lake equality pytested)."""
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "wc",
            F.explode(
                F.sequence(F.lit(1), F.length("w") - F.lit(1))
            ).alias("i"),
            F.col("w"),
        )
        .select(
            F.substring(F.col("w"), F.col("i"), F.lit(2)).alias("pair"), "wc"
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.col("pair"))
        .limit(k)
    )


def filter_ablation_matrix(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-filter ABLATION audit: the population count of every
    observed combination of Gopher rule outcomes — the table behind
    'which filter drives removal' ablation sections (Rae et al. 2021
    §A2; RefinedWeb's removal-rate accounting). One row per observed
    (rule_word_count, rule_mean_len, rule_alpha_frac, rule_stopwords)
    bitmask with its document count and corpus share; the all-True row
    is the surviving population, and each single-False row prices one
    rule's marginal removal.

    Scale: the per-doc rule battery is a pure zero-shuffle map
    (gopher_rules); the combination count is ONE partial-aggregable
    hash agg whose output is ≤2⁴ rows at any corpus size, so the
    share window runs on a bounded frame — the whole audit touches
    the corpus exactly once.
    """
    from pyspark.sql import Window as W

    flags = gopher_rules(df, id_col, text_col)
    combos = flags.groupBy(
        "rule_word_count", "rule_mean_len", "rule_alpha_frac", "rule_stopwords"
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(W.partitionBy(F.lit(1)))
    return combos.select(
        "rule_word_count",
        "rule_mean_len",
        "rule_alpha_frac",
        "rule_stopwords",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs") / total, 6).alias("share"),
    )


def vocab_coverage(df, id_col: str, text_col: str, vocab_size: int = 500) -> DataFrame:
    """Tokenizer-coverage / OOV-rate audit: per-document fraction of
    token occurrences falling outside the top-``vocab_size`` corpus
    vocabulary (count desc, token asc — a deterministic total order,
    so the vocabulary boundary is engine-stable). The fertility/
    coverage statistic a tokenizer redesign is judged on: a rising
    OOV tail per source or language flags content the vocabulary
    under-serves.

    Returns (id, n_tokens, n_oov, oov_rate); docs with zero tokens
    emit nothing. Scale: the vocabulary stage is a map-side-folding
    hash agg that collapses to vocabulary size, then a ``vocab_size``-
    row BROADCAST back onto the token stream — the corpus-sized
    exchanges carry (id, token) and (id, flag) narrow rows only, and
    the per-doc re-agg is partial-aggregable.
    """
    # tokenize ONCE (r17 optimization round, guide §2.3/§6): the
    # vocabulary agg and the per-doc OOV agg both consumed the token
    # stream, so the corpus was scanned and tokenized twice per
    # invocation; both legs now explode one materialized (id, toks)
    # artifact (array form — text-sized, not exploded-row-sized).
    tokd = materialize_once(
        df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    )
    toks = tokd.select(F.col(id_col), F.explode("__toks").alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("tok"))
        .limit(int(vocab_size))
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


def bpe_merges(df: DataFrame, text_col: str, n_merges: int = 4) -> DataFrame:
    """Iterated BPE merge induction (Sennrich et al., ACL 2016): the
    first ``n_merges`` merge rules learned from the corpus, each row
    one round — (merge_idx, left_tok, right_tok, merged,
    n_occurrences). Round r counts adjacent TOKEN-pair frequencies
    (weighted by corpus word frequency) over the vocabulary with
    rounds 1..r-1 already applied, picks the argmax (count desc, then
    (left, right) asc — a deterministic total order), and applies it
    greedy-leftmost-non-overlapping to every word.

    The merge application is an ``F.aggregate`` fold: append each
    token unless the accumulator tail equals ``left`` and the token
    equals ``right``, in which case the tail becomes the merged
    token. The fold IS leftmost-non-overlapping: a produced token
    ``left||right`` can never re-match as ``left`` within the round
    (it is strictly longer), so overlapping candidate chains resolve
    to even offsets — the run-parity rule the DuckDB oracle replays
    with gaps-and-islands windows (pytested against a pure-Python BPE
    reference as well).

    Scale (the ``bpe_pair_counts`` story, iterated): stage 1 collapses
    the corpus to its VOCABULARY once — the only corpus-sized
    exchange; each round then costs one vocabulary-sized pair
    aggregation plus a zero-exchange fold map over the cached vocab
    frame. The per-round argmax is ONE collected row (bounded by
    definition — K rows total ride the driver, never the corpus), the
    unrolled-fixpoint discipline of graph_pagerank_dedup. Vocabulary
    state is exactly what a tokenizer trainer keeps; corpus-free
    after stage 1.
    """
    vocab = _bpe_vocab(df, text_col).persist()
    states = [vocab]
    try:
        rounds, states = _bpe_rounds(
            vocab, int(n_merges), apply_last=False, states_needed="none"
        )
        return df.sparkSession.createDataFrame(
            rounds,
            "merge_idx int, left_tok string, right_tok string, "
            "merged string, n_occurrences long",
        )
    finally:
        for s in states:
            s.unpersist()


def _bpe_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (w, wc, toks) vocabulary frame, toks = characters."""
    return (
        df.select(F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .withColumn("toks", F.split("w", ""))
    )


def _bpe_merge_fold(l: str, r: str):
    """Greedy-leftmost-non-overlapping application of merge (l, r) to
    a token array, as an ``F.aggregate`` fold column function."""
    lc, rc = F.lit(l), F.lit(r)

    def apply(toks_col):
        return F.aggregate(
            toks_col,
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lc)
                & (x == rc),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.concat(lc, rc)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    return apply


def _bpe_small(vocab: DataFrame) -> bool:
    """Runtime dispatch: is this vocabulary under the driver-loop cap?"""
    cap = int(
        os.environ.get("SPARK_GRAFT_BPE_SMALL_VOCAB", str(BPE_SMALL_VOCAB_ROWS))
    )
    return cap > 0 and vocab.count() <= cap


def _bpe_rounds(
    vocab: DataFrame,
    n_merges: int,
    apply_last: bool,
    states_needed: str = "all",
    small: bool | None = None,
):
    """Run ``n_merges`` BPE rounds over an (already persisted)
    vocabulary frame; return (merge rows, per-round vocab states
    v1..). Each produced state is PERSISTED (r16, VERDICT r15 item 6:
    the lazy-over-vocab chain made readout k re-apply all k prior
    folds — O(K²) vocabulary passes; with per-state persist, round
    k+1's pair-count collect materializes state k once and every
    later readout is a single cache scan — O(K) passes total).
    Callers own the unpersist scope for EVERY returned state
    (``for s in states: s.unpersist()`` — states[0] is ``vocab``
    itself); on an internal error the states persisted so far are
    released here.

    ``states_needed`` ("all" | "final" | "none", r17): which produced
    states the CALLER will read as DataFrames. The distributed loop
    ignores it (every state must exist as a frame to drive the next
    round anyway); the driver-small path uses it to skip building
    Spark frames nobody reads — creating K vocabulary-sized
    createDataFrames cost more than the barriers it saved (measured
    +0.4 s on the fertility card). With "final"/"none" the returned
    list still ends at the final state / holds just ``vocab``, so
    ``states[-1]`` keeps meaning "the final vocabulary state"."""
    # r17 optimization round: a driver-small vocabulary (runtime count,
    # see BPE_SMALL_VOCAB_ROWS) runs the whole K-round loop in Python —
    # one collect instead of K (pair-agg job + argmax collect + persist)
    # barriers. Same integer pair counts, same (cnt desc, l, r) argmax
    # total order, same greedy-leftmost fold — bit-identical states.
    if small is None:
        small = _bpe_small(vocab)
    if small:
        return _bpe_rounds_driver(vocab, n_merges, apply_last, states_needed)
    rounds: list[tuple] = []
    states = [vocab]
    cur = vocab
    try:
        for idx in range(1, n_merges + 1):
            pairs = (
                cur.select(
                    "wc",
                    F.posexplode(F.slice("toks", 1, F.size("toks") - 1)).alias(
                        "i", "l"
                    ),
                    F.col("toks"),
                )
                .select(
                    "wc", "l", F.element_at("toks", F.col("i") + 2).alias("r")
                )
                .groupBy("l", "r")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not pairs:  # vocabulary fully merged / empty corpus
                break
            l, r, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["cnt"])
            rounds.append((idx, l, r, l + r, cnt))
            if idx < n_merges or apply_last:
                cur = cur.withColumn(
                    "toks", _bpe_merge_fold(l, r)(F.col("toks"))
                ).persist()
                states.append(cur)
    except Exception:
        for s in states[1:]:
            s.unpersist()
        raise
    return rounds, states


def _bpe_collect_vocab(vocab: DataFrame) -> list[tuple[str, int, list[str]]]:
    """Collect a driver-small vocabulary frame as (w, wc, toks) rows."""
    return [
        (r["w"], int(r["wc"]), list(r["toks"]))
        for r in vocab.select("w", "wc", "toks").collect()
    ]


def _bpe_chain_py(
    cur: list[tuple[str, int, list[str]]], n_merges: int, apply_last: bool
):
    """The pure-Python BPE round loop over collected vocabulary rows —
    returns (merge rows, word-state snapshots incl. the initial one).
    The per-round logic mirrors the Spark expressions verbatim: pair
    counts weighted by wc over adjacent token pairs, argmax by (count
    desc, left asc, right asc), greedy-leftmost-non-overlapping fold
    (append unless the accumulator tail equals ``left`` and the token
    equals ``right``). Integer counts and string concatenation only —
    bit-identical to the distributed loop by construction. String
    comparisons agree with Spark's binary UTF-8 order because UTF-8
    byte order preserves code-point order."""
    rounds: list[tuple] = []
    word_states = [cur]
    for idx in range(1, n_merges + 1):
        cnt: dict[tuple[str, str], int] = {}
        for _w, wc, toks in cur:
            for pair in zip(toks, toks[1:]):
                cnt[pair] = cnt.get(pair, 0) + wc
        if not cnt:  # vocabulary fully merged / empty corpus
            break
        (l, r), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rounds.append((idx, l, r, l + r, int(c)))
        if idx < n_merges or apply_last:
            lr = l + r
            nxt = []
            for w, wc, toks in cur:
                acc: list[str] = []
                for x in toks:
                    if acc and x == r and acc[-1] == l:
                        acc[-1] = lr
                    else:
                        acc.append(x)
                nxt.append((w, wc, acc))
            cur = nxt
            word_states.append(cur)
    return rounds, word_states


def _bpe_rounds_driver(
    vocab: DataFrame, n_merges: int, apply_last: bool, states_needed: str
):
    """Driver-side twin of the distributed ``_bpe_rounds`` loop for
    vocabularies under the cap: collect (w, wc, toks) once, run the K
    pair-count/argmax/fold rounds in Python (``_bpe_chain_py``), and
    hand back as createDataFrames only the states the caller reads
    (``states_needed``) — so every caller's downstream Spark
    arithmetic (encode joins, token counts, fertility sums) is
    UNCHANGED and exact-integer parity holds."""
    spark = vocab.sparkSession
    rounds, word_states = _bpe_chain_py(
        _bpe_collect_vocab(vocab), n_merges, apply_last
    )
    schema = "w string, wc long, toks array<string>"
    states: list[DataFrame] = [vocab]
    if states_needed == "all":
        states += [spark.createDataFrame(ws, schema) for ws in word_states[1:]]
    elif states_needed == "final":
        # ALWAYS a local relation — even a zero-merge chain's "final"
        # state must survive the caller's finally-block unpersist of
        # ``vocab`` without re-deriving the corpus collapse
        states.append(spark.createDataFrame(word_states[-1], schema))
    return rounds, states


def bpe_fertility(df: DataFrame, text_col: str, n_merges: int = 4) -> DataFrame:
    """Tokenizer COMPRESSION curve: for each merge count 0..K, the
    corpus-level token statistics under the first ``n_merges`` learned
    BPE rules — (n_merges, total_tokens, tokens_per_word,
    chars_per_token). Round 0 is raw characters (chars_per_token
    exactly 1.0); each merge monotonically shrinks total_tokens. The
    table a tokenizer-budget decision reads: where the curve flattens
    is where additional merges stop paying.

    Exactness: token totals are exact integer sums Σ wc·|toks| folded
    from the SAME vocabulary states the merge chain produced; the two
    ratios are 6dp-rounded ENGINE-side (Spark round ≡ oracle round on
    these fixed division sequences). Scale: identical to bpe_merges —
    the corpus collapses to its vocabulary once; the K+1 readouts are
    ONE job (a union of one-row aggregates over the persisted states
    — r16, VERDICT r15 item 6: the former per-state sequential
    collects re-applied every prior fold, O(K²) vocabulary passes).

    Fixed-point padding (r16 ADVICE): a corpus supporting fewer than
    ``n_merges`` merges repeats its final state's row for the missing
    rounds — merge j+1..K are no-ops on a fully merged vocabulary, so
    the curve stays n_merges+1 rows (the oracle's per-round arms carry
    the same fixed point). An EMPTY corpus yields n_merges+1 all-NULL
    stat rows (the oracle's empty-CTE NULL aggregates), not a crash.
    """
    from functools import reduce

    vocab = _bpe_vocab(df, text_col).persist()
    states = [vocab]
    try:
        if _bpe_small(vocab):
            # r17: the driver-small chain — the K+1 per-state totals are
            # EXACT integer sums, so they fold in Python for free while
            # the chain runs; only the two divisions (and their 6dp
            # rounding) stay in Spark, on the same integers the
            # distributed agg would produce — identical output by
            # construction (creating K+1 vocab-sized createDataFrames
            # just to 1-row-aggregate them measured SLOWER than the
            # distributed loop, +0.4 s).
            _, word_states = _bpe_chain_py(
                _bpe_collect_vocab(vocab), int(n_merges), apply_last=True
            )
            ints = []
            for k in range(int(n_merges) + 1):
                ws = word_states[min(k, len(word_states) - 1)]
                if ws:
                    tt = sum(wc * len(toks) for _w, wc, toks in ws)
                    tw = sum(wc for _w, wc, _t in ws)
                    tc = sum(wc * len(w) for w, wc, _t in ws)
                else:  # empty corpus → all-NULL stat rows
                    tt = tw = tc = None
                ints.append((k, tt, tw, tc))
            return df.sparkSession.createDataFrame(
                ints, "n_merges int, tt long, tw long, tc long"
            ).select(
                "n_merges",
                F.col("tt").alias("total_tokens"),
                F.round(F.col("tt").cast("double") / F.col("tw"), 6).alias(
                    "tokens_per_word"
                ),
                F.round(F.col("tc").cast("double") / F.col("tt"), 6).alias(
                    "chars_per_token"
                ),
            )
        _, states = _bpe_rounds(vocab, int(n_merges), apply_last=True)
        arms = []
        for k in range(int(n_merges) + 1):
            frame = states[min(k, len(states) - 1)]
            arms.append(
                frame.agg(
                    F.sum(F.col("wc") * F.size("toks")).alias("total_tokens"),
                    F.round(
                        F.sum(F.col("wc") * F.size("toks")).cast("double")
                        / F.sum("wc"),
                        6,
                    ).alias("tokens_per_word"),
                    F.round(
                        F.sum(F.col("wc") * F.length("w")).cast("double")
                        / F.sum(F.col("wc") * F.size("toks")),
                        6,
                    ).alias("chars_per_token"),
                ).select(
                    F.lit(k).alias("n_merges"),
                    "total_tokens",
                    "tokens_per_word",
                    "chars_per_token",
                )
            )
        stats = reduce(DataFrame.unionAll, arms).collect()
        rows = [
            (
                int(s["n_merges"]),
                None if s["total_tokens"] is None else int(s["total_tokens"]),
                s["tokens_per_word"],
                s["chars_per_token"],
            )
            for s in stats
        ]
        return df.sparkSession.createDataFrame(
            rows,
            "n_merges int, total_tokens long, tokens_per_word double, "
            "chars_per_token double",
        )
    finally:
        for s in states:
            s.unpersist()


def bpe_fertility_by_source(
    df: DataFrame,
    text_col: str,
    stratum_col: str,
    n_merges: int = 4,
) -> DataFrame:
    """Per-stratum tokenizer FERTILITY under the GLOBALLY learned BPE
    rules: (stratum, total_words, total_tokens, tokens_per_word,
    chars_per_token) after ``n_merges`` merges — the audit that shows
    which source/language the shared tokenizer under-serves (high
    tokens/word = the vocabulary wasn't learned for it), the
    per-source complement of ``bpe_fertility``'s corpus curve and
    ``vocab_coverage``'s OOV rate.

    The key identity that keeps this cheap: a word's tokenization
    under K merges is a pure function of the WORD — source plays no
    role — so the per-stratum totals are the per-(stratum, word)
    counts JOINED against the global chain's final vocabulary state
    (Σ wc_{s,w} · |toks_K(w)|). No second merge application, no
    per-document fold: one extra corpus-collapsing agg + one
    vocabulary-sized join. Scale: both frames are vocabulary-keyed;
    the join shuffles (word, counts) rows only.
    """
    vocab = _bpe_vocab(df, text_col).persist()
    states = [vocab]
    try:
        small = _bpe_small(vocab)
        _, states = _bpe_rounds(
            vocab, int(n_merges), apply_last=True,
            states_needed="final", small=small,
        )
        # checkpoint the (w, |toks_K|) readout: the returned plan runs
        # after the finally block drops the per-round caches, and would
        # otherwise re-derive the whole merge chain (see bpe_encode).
        # Driver-small chains skip the checkpoint — their final state
        # is already a local relation (r17), a job-free plan literal.
        final = states[-1].select(
            "w", F.size("toks").cast("long").alias("__n_toks")
        )
        if not small:
            final = materialize_once(final)
        by_src = (
            df.select(
                F.col(stratum_col),
                F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"),
            )
            .groupBy(stratum_col, "w")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
        return (
            by_src.join(final, "w")
            .groupBy(stratum_col)
            .agg(
                F.sum("wc").alias("total_words"),
                F.sum(F.col("wc") * F.col("__n_toks")).alias("total_tokens"),
                F.round(
                    F.sum(F.col("wc") * F.col("__n_toks")).cast("double")
                    / F.sum("wc"),
                    6,
                ).alias("tokens_per_word"),
                F.round(
                    F.sum(F.col("wc") * F.length("w")).cast("double")
                    / F.sum(F.col("wc") * F.col("__n_toks")),
                    6,
                ).alias("chars_per_token"),
            )
            .select(
                stratum_col,
                F.col("total_words").cast("long"),
                F.col("total_tokens").cast("long"),
                "tokens_per_word",
                "chars_per_token",
            )
        )
    finally:
        # the returned frame stays lazily valid: its lineage re-derives
        # the (plan-literal) fold chain if consumed after the caches drop
        for s in states:
            s.unpersist()


def bpe_token_vocab(final_state: DataFrame) -> DataFrame:
    """The trained tokenizer's TOKEN-ID table from a merge chain's
    final vocabulary state: (tok, token_id) with ids dense-ranked by
    token string asc — a deterministic, engine-stable assignment.

    Scale: the token vocabulary is BOUNDED by |alphabet| + n_merges
    (each merge mints exactly one new token), so the global
    row_number window runs on a frame that is tiny by construction —
    this is the tokenizer ARTIFACT a trainer ships, not corpus data.
    """
    from pyspark.sql import Window as W

    return (
        final_state.select(F.explode("toks").alias("tok"))
        .distinct()
        .select(
            "tok",
            F.row_number()
            .over(W.orderBy(F.asc("tok")))
            .cast("long")
            .alias("token_id"),
        )
    )


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 4
) -> DataFrame:
    """APPLY the learned BPE tokenizer to the corpus (r16, VERDICT r15
    item 3 — the missing link between tokenizer training and sequence
    assembly): per document, the token-ID sequence under the first
    ``n_merges`` merges — (id, token_ids array<bigint>, n_tokens).
    Token ids come from ``bpe_token_vocab`` (dense rank by token
    string over the final vocabulary state's subword set).

    The word-purity identity keeps this ONE vocabulary-keyed join,
    not a second merge application: a word's tokenization under K
    merges is a pure function of the word, so the per-word token-id
    arrays are computed once on the vocabulary frame (posexplode →
    id join → order-preserving reassembly) and documents just join
    word → array and flatten in word order. Docs with zero words
    emit nothing (the oracle's inner join does the same).

    Scale: the merge chain costs what ``bpe_merges`` costs (corpus
    collapses to its vocabulary once); the word→ids map is
    vocabulary-sized; the doc-side exchanges carry (id, word-pos)
    rows into a vocabulary-keyed join plus the per-doc reassembly
    agg — the one corpus-sized exchange any per-doc-array output
    needs, keyed by id.
    """
    vocab = _bpe_vocab(df, text_col).persist()
    states = [vocab]
    try:
        small = _bpe_small(vocab)
        _, states = _bpe_rounds(
            vocab, int(n_merges), apply_last=True,
            states_needed="final", small=small,
        )
        # Materialize the final vocabulary state (r16 optimization round,
        # guide §5 caching): the returned plan consumes it through TWO
        # arms (token-id vocab + word→ids map) and executes AFTER the
        # finally block below drops the per-round caches — without this
        # checkpoint the final job re-derived the whole corpus-collapse +
        # K-fold chain (measured 6.8 s of corpus_tokenize_bpe's 7.6 s
        # sf0.1 wall in the final job alone; 2.0 s after). The projection
        # builds a NEW plan so persist_disk mode caches it independently
        # of the per-round persists it reads from. Driver-small chains
        # (r17) skip the checkpoint: the final state is a local relation
        # — re-consumption is free, no re-derivation exists.
        final = states[-1].select("w", "toks")
        if not small:
            final = materialize_once(final)
        tok_ids = bpe_token_vocab(final)
        wmap = (
            final.select("w", F.posexplode("toks").alias("pos", "tok"))
            .join(F.broadcast(tok_ids), "tok")
            .groupBy("w")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "token_id"))
                ).alias("ps")
            )
            .select(
                "w", F.transform("ps", lambda s: s["token_id"]).alias("tok_ids")
            )
        )
        docw = df.select(
            F.col(id_col),
            F.posexplode(tokenize(F.lower(F.col(text_col)))).alias(
                "wpos", "w"
            ),
        )
        return (
            docw.join(wmap, "w")
            .groupBy(id_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("wpos", "tok_ids"))
                ).alias("seq")
            )
            .select(
                F.col(id_col),
                F.flatten(
                    F.transform("seq", lambda s: s["tok_ids"])
                ).alias("token_ids"),
            )
            .withColumn("n_tokens", F.size("token_ids").cast("long"))
        )
    finally:
        # lazily-valid lineage: consumption after the caches drop
        # re-derives the plan-literal fold chain (one corpus collapse)
        for s in states:
            s.unpersist()


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 4
) -> DataFrame:
    """Per-document REAL-token budget under the learned BPE chain:
    (id, n_tokens) with n_tokens = Σ_w count(id, w)·|toks_K(w)| — the
    counts ``pack_sequences_bpe`` budgets with instead of whitespace
    words. Every input doc appears; zero-word docs carry n_tokens 0.

    Scale: the word-purity identity again — one corpus-collapsing
    (id, word) agg joined against the vocabulary's final token
    lengths; no per-document merge application, shuffles carry word
    keys and (id, count) rows only.
    """
    vocab = _bpe_vocab(df, text_col).persist()
    states = [vocab]
    try:
        small = _bpe_small(vocab)
        _, states = _bpe_rounds(
            vocab, int(n_merges), apply_last=True,
            states_needed="final", small=small,
        )
        # checkpoint the (w, |toks_K|) readout: the returned plan runs
        # after the finally block drops the per-round caches, and would
        # otherwise re-derive the whole merge chain (see bpe_encode);
        # driver-small chains skip it — local relation, free re-reads
        final = states[-1].select(
            "w", F.size("toks").cast("long").alias("__n_toks")
        )
        if not small:
            final = materialize_once(final)
        per_doc = (
            df.select(
                F.col(id_col),
                F.explode(tokenize(F.lower(F.col(text_col)))).alias("w"),
            )
            .groupBy(id_col, "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .join(final, "w")
            .groupBy(id_col)
            .agg(F.sum(F.col("c") * F.col("__n_toks")).alias("__n_bpe"))
        )
        return (
            df.select(id_col)
            .join(per_doc, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("__n_bpe"), F.lit(0))
                .cast("long")
                .alias("n_tokens"),
            )
        )
    finally:
        for s in states:
            s.unpersist()
