"""Retrieval scoring for training-data curation: BM25 and reciprocal-
rank fusion (RRF).

A 100 TB curation pipeline uses retrieval constantly — pulling
contamination candidates for an eval suite, mining quality exemplars,
building hard-negative sets for embedding training. The two standard
primitives are the lexical scorer (BM25 — Robertson & Walker's
Okapi formula, the default in Lucene/Elasticsearch) and hybrid fusion
of a lexical leg with an embedding leg (RRF — Cormack, Clarke &
Büttcher, SIGIR 2009: ``score(d) = Σ_legs 1/(k + rank_leg(d))``,
rank-only so the two legs' incomparable score scales never matter).

Scale notes (both ops):
- BM25 is one tokenize pass → one hash agg keyed by doc_id (the tf
  conditional sums fold map-side), with the corpus stats (N, avgdl,
  per-term df) computed as a 1-ROW aggregate that broadcasts into the
  scoring projection — no vocabulary-sized shuffle, no driver
  round-trip, and the query terms live in the plan as literals.
- Top-k selection is TakeOrderedAndProject (k rows per partition),
  never a global window over all N scored docs.
- RRF ranks are row_numbers over the two ALREADY-TRUNCATED top-k legs
  (k rows each), so the window cost is O(k), not O(N); the fuse join
  is a broadcast of two k-row frames.

Reference parity: the reference engine (rafaeljusto/gomaxscale) is a
CDC consumer with no retrieval surface — these operators extend the
LLM-pipeline side of SURVEY.md §2 (B16/B17 adjacents), not a port.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: Okapi BM25 defaults (Robertson et al., TREC-3; Lucene's defaults).
K1 = 1.2
B = 0.75


def _words(text_col: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped — the same
    tokenizer every text_* catalog entry uses (base.py float/token
    discipline), so BM25 doc lengths agree with text_token_stats."""
    return F.filter(F.split(F.lower(text_col), " "), lambda x: x != "")


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 score of every document containing ≥1 query term.

    Returns ``(id_col, score)`` — score rounded to 6dp (base.py float
    discipline). The per-term sum is written as a FIXED-ORDER chain of
    additions (term 0 + term 1 + ...), so an SQL oracle evaluating the
    same chain produces bit-identical doubles; a groupBy-sum over an
    exploded term column would leave the summation order to the engine.

    idf uses the non-negative variant ``ln(1 + (N - df + 0.5)/(df +
    0.5))`` (Lucene's): plain Robertson idf goes negative for terms in
    more than half the corpus, which breaks the "more matches can only
    help" monotonicity a curation filter wants.

    N counts ALL corpus rows — including empty / whitespace-only
    documents — exactly like ``corpus_term_stats``'s ``n_docs``, so the
    exact and hashed-df forms use the same N and the "hashed ≡ exact on
    collision-free vocabularies" invariant holds on corpora containing
    empty docs too (r13 ADVICE). avgdl likewise averages over all rows
    (an empty doc contributes dl=0), matching n_tokens/n_docs.
    """
    from .materialize import materialize_once

    # ONE tokenize pass (r17 optimization round — the r16 batch-form
    # fix applied to the single-query form too): the df-stats, avgdl,
    # tf and length legs each re-tokenized the corpus from raw text
    # (four split/lower/filter passes and four parquet scans per
    # invocation); all four now read one materialized (id, __toks)
    # frame. Values identical — same _words expression, applied once.
    tokd = materialize_once(tokenized_docs(docs, id_col, text_col))
    toks = tokd.select(F.col(id_col), F.explode(F.col("__toks")).alias("__w"))
    # 1-row corpus stats: N, avgdl, and df per query term — partial-
    # aggregable conditional counts, broadcast into the scoring join.
    df_aggs = [
        F.count_distinct(
            F.when(F.col("__w") == F.lit(t), F.col(id_col))
        ).alias(f"__df{i}")
        for i, t in enumerate(terms)
    ]
    stats = toks.agg(*df_aggs).crossJoin(
        tokd.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.avg(F.size(F.col("__toks"))).alias("__avgdl"),
        )
    )
    # per-doc: length + tf per query term, one hash agg (map-side fold)
    tf_aggs = [
        F.sum(F.when(F.col("__w") == F.lit(t), 1).otherwise(0))
        .cast("double")
        .alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]
    lengths = tokd.select(
        F.col(id_col), F.size(F.col("__toks")).cast("double").alias("__dl")
    )
    tf = (
        toks.filter(F.col("__w").isin(list(terms)))
        .groupBy(id_col)
        .agg(*tf_aggs)
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    return tf.select(
        F.col(id_col), F.round(_score_chain(len(terms), k1, b), 6).alias("score")
    )


def _score_chain(n_terms: int, k1: float = K1, b: float = B) -> Column:
    """The BM25 sum over ``__tf{i}``/``__df{i}``/``__n``/``__dl``/
    ``__avgdl`` columns as a FIXED-ORDER addition chain — one shared
    construction, so the exact-df and hashed-df variants (and the
    streaming lake's scorer) all evaluate the identical expression
    tree and an SQL twin can reproduce it bit-for-bit."""
    return _score_chain_cols(
        [(f"__tf{i}", f"__df{i}") for i in range(n_terms)], k1, b
    )


def _score_chain_cols(
    pairs: Sequence[tuple[str, str]], k1: float = K1, b: float = B
) -> Column:
    """``_score_chain`` over EXPLICIT (tf_col, df_col) name pairs — the
    batched form scores several queries against one shared tf/df frame,
    so each query's chain picks its own columns out of the union."""
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("__dl") / F.col("__avgdl")
    )
    score: Column = F.lit(0.0)
    for tf_c, df_c in pairs:
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(df_c) + F.lit(0.5))
            / (F.col(df_c) + F.lit(0.5))
        )
        score = score + idf * F.col(tf_c) / (F.col(tf_c) + norm)
    return score


def bm25_topk(
    docs: DataFrame, terms: Sequence[str], k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Top-k docs by BM25 — TakeOrderedAndProject, ties broken by id."""
    return (
        bm25_scores(docs, terms, id_col=id_col)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    legs: Sequence[DataFrame],
    id_col: str = "doc_id",
    k_const: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of ≥2 ranked legs.

    Each leg is an ALREADY-TRUNCATED top-k frame with columns
    ``(id_col, score)``; rank within a leg = row_number by
    ``(round(score, 6) desc, id)`` — the 6dp round happens in the legs,
    so rank order is reproducible across engines; the id tie-break
    makes it total. A doc absent from a leg contributes 0 for that leg
    (the standard RRF convention). ``k_const=60`` per Cormack et al.

    Scale: the window runs over k-row frames (the legs are truncated
    BEFORE ranking), and the fuse is an outer join of k-row frames —
    nothing here touches corpus-sized data.
    """
    from pyspark.sql import Window

    ranked = []
    for i, leg in enumerate(legs):
        w = Window.orderBy(F.desc("score"), F.col(id_col))
        ranked.append(
            leg.select(
                F.col(id_col),
                F.row_number().over(w).cast("long").alias(f"rank_{i}"),
            )
        )
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.join(nxt, id_col, "full_outer")
    contrib: Column = F.lit(0.0)
    for i in range(len(legs)):
        contrib = contrib + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
    return fused.select(
        F.col(id_col),
        *[F.col(f"rank_{i}") for i in range(len(legs))],
        F.round(contrib, 6).alias("rrf_score"),
    )


# --------------------------------------------------------------- hashed-
# vocabulary BM25: the serving/streaming form. Exact per-term df needs a
# vocabulary-sized table; hashing terms into a FIXED bucket space makes
# the corpus statistics a bounded artifact (≤ n_buckets rows + one meta
# row) that is ADDITIVE across disjoint batches — the property the
# streaming TermStatsLakeSink (streaming/term_stats.py) is built on.
# Collisions inflate df slightly (bucket df ≥ term df), the standard
# hashed-vocabulary trade; tf stays exact (it comes from the scored doc
# itself, not the stats).

#: Default bucket space: 64k buckets ≈ KBs of stats whatever the corpus.
N_TERM_BUCKETS = 1 << 16


def term_bucket(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Driver-side twin of the in-plan portable token hash
    (PORTABLE_TOKEN_HASH discipline): 60-bit md5 prefix mod n_buckets.
    Used to turn QUERY terms into bucket literals."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def _bucket_col(tok: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )


def corpus_term_stats(
    docs: DataFrame,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The bounded corpus statistics BM25 serving needs, one pass:

    - ``term_stats``: (bucket, df) — documents containing ≥1 token in
      the bucket (distinct doc-bucket pairs, then a count);
    - ``meta``: 1 row (n_docs, n_tokens) — corpus size + total token
      count (avgdl = n_tokens / n_docs at scoring time, so the stored
      artifact is pure integers and additive).

    Both are additive across DISJOINT document batches: summing per-
    batch outputs equals computing over the union (each doc lives in
    exactly one batch) — the lake's compaction invariant, pytested.

    Scale: one tokenize pass — r17 optimization round: the df leg and
    the meta leg each re-tokenized the input (and the streaming lake
    sink EXECUTES both legs, as two parquet writes, per micro-batch);
    both now read one materialized (id, __toks) frame. The distinct +
    count is a hash agg on (doc, bucket) pairs — never raw text;
    outputs are KBs.
    """
    from .materialize import materialize_once

    tokd = materialize_once(tokenized_docs(docs, id_col, text_col))
    return corpus_term_stats_tokenized(tokd, n_buckets, id_col)


def bm25_against_stats(
    docs: DataFrame,
    terms: Sequence[str],
    term_stats: DataFrame,
    meta: DataFrame,
    n_buckets: int = N_TERM_BUCKETS,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 with hashed-vocabulary df from an EXTERNAL stats artifact —
    a (bucket, df) table + (n_docs, n_tokens) meta row, e.g.
    ``corpus_term_stats`` output or the streaming lake's committed sum.
    Same ``_score_chain`` expression tree as ``bm25_scores``, so two
    stats artifacts with equal counts score bit-identically (the
    batch ≡ lake equality the sink pytests).

    Scale: the stats legs collapse to ONE broadcast row (conditional
    sums over the ≤ n_buckets-row table); scoring is one tokenize pass
    over ``docs`` (the docs being scored — a batch, not the corpus).
    """
    buckets = [term_bucket(t, n_buckets) for t in terms]
    df_row = term_stats.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == F.lit(bk), F.col("df"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__df{i}")
            for i, bk in enumerate(buckets)
        ]
    )
    stats = (
        meta.select(
            F.col("n_docs").cast("double").alias("__n"),
            (
                F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
            ).alias("__avgdl"),
        )
        .crossJoin(df_row)
    )
    toks = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("__w")
    )
    tf_aggs = [
        F.sum(F.when(F.col("__w") == F.lit(t), 1).otherwise(0))
        .cast("double")
        .alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]
    lengths = docs.select(
        F.col(id_col), F.size(_words(F.col(text_col))).cast("double").alias("__dl")
    )
    tf = (
        toks.filter(F.col("__w").isin(list(terms)))
        .groupBy(id_col)
        .agg(*tf_aggs)
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    return tf.select(
        F.col(id_col), F.round(_score_chain(len(terms), k1, b), 6).alias("score")
    )


def bm25_topk_batch(
    docs: DataFrame,
    queries: Sequence[Sequence[str]],
    k: int,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact top-k BM25 for SEVERAL queries in ONE corpus pass —
    (query_id, id, score), query_id = position in ``queries``.

    The serving-tier shape (the lexical twin of
    similarity_cosine_topk_batch): Q sequential scans become one.
    The term UNION across queries drives a single tokenize → tf/df
    pass; each query's score is its own fixed-order chain picking its
    terms' columns out of the shared frame; per-query top-k is the
    salted two-phase selection (domain_cap_salted with query_id as the
    key — per-key merge state capped at n_salts·k structs, no global
    window). Membership per query = matches ≥1 of ITS terms (the
    integer tf predicate, not a float-score test).
    """
    from .materialize import materialize_once
    from .sampling import domain_cap_salted

    all_terms: list[str] = []
    for q in queries:
        for t in q:
            if t not in all_terms:
                all_terms.append(t)
    idx = {t: i for i, t in enumerate(all_terms)}

    # ONE tokenize pass (r16 optimization round — the r13
    # shared-tokenization lesson applied to the batch form too): the
    # df-stats, avgdl, tf and length legs each re-tokenized the corpus
    # from raw text (four split/lower/filter passes per invocation);
    # all four now read one materialized (id, __toks) frame. Values
    # identical — same _words expression, applied once.
    tokd = materialize_once(tokenized_docs(docs, id_col, text_col))
    toks = tokd.select(
        F.col(id_col), F.explode(F.col("__toks")).alias("__w")
    )
    df_aggs = [
        F.count_distinct(
            F.when(F.col("__w") == F.lit(t), F.col(id_col))
        ).alias(f"__df{i}")
        for i, t in enumerate(all_terms)
    ]
    # N = all corpus rows (same definition as corpus_term_stats.n_docs —
    # see bm25_scores' docstring)
    stats = toks.agg(*df_aggs).crossJoin(
        tokd.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.avg(F.size(F.col("__toks"))).alias("__avgdl"),
        )
    )
    tf_aggs = [
        F.sum(F.when(F.col("__w") == F.lit(t), 1).otherwise(0))
        .cast("double")
        .alias(f"__tf{i}")
        for i, t in enumerate(all_terms)
    ]
    lengths = tokd.select(
        F.col(id_col), F.size(F.col("__toks")).cast("double").alias("__dl")
    )
    tf = (
        toks.filter(F.col("__w").isin(all_terms))
        .groupBy(id_col)
        .agg(*tf_aggs)
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    scored = _batch_scores_one_pass(tf, queries, idx, id_col, k1, b)
    top = domain_cap_salted(
        scored, key_col="query_id", quality_col="score", id_col=id_col, k=k
    )
    return top.orderBy("query_id", F.desc("score"), F.col(id_col))


def _batch_scores_one_pass(
    tf: DataFrame,
    queries: Sequence[Sequence[str]],
    idx: dict[str, int],
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """(query_id, id, score) rows for every query whose terms hit the
    doc — ONE projection + explode over the shared tf frame (r16
    optimization round, guide §2.4). The previous per-query
    filter/select arms unioned Q sub-plans; column pruning made each
    arm's aggregation subtree unique (an arm keeps only its own query's
    __tf columns), so exchange reuse never fired and the corpus-sized
    groupBy(id) tf exchange — plus the token-sized df and avgdl stat
    aggs — executed once PER QUERY. Here each tf row emits one
    array<struct(query_id, score)> entry per matching query (hit = 0
    entries nulled and filtered in-plan), then explodes: identical
    rows, identical fixed-order score chains, ONE aggregation subtree
    however many queries the batch carries."""
    entries = []
    for qid, q in enumerate(queries):
        pairs = [(f"__tf{idx[t]}", f"__df{idx[t]}") for t in q]
        hit: Column = F.lit(0.0)
        for t in q:
            hit = hit + F.col(f"__tf{idx[t]}")
        entries.append(
            F.when(
                hit > 0,
                F.struct(
                    F.lit(qid).alias("query_id"),
                    F.round(_score_chain_cols(pairs, k1, b), 6).alias("score"),
                ),
            )
        )
    return tf.select(
        F.col(id_col),
        F.explode(F.filter(F.array(*entries), lambda e: e.isNotNull())).alias(
            "__q"
        ),
    ).select(
        F.col("__q.query_id").alias("query_id"),
        F.col(id_col),
        F.col("__q.score").alias("score"),
    )


def rrf_fuse_batch(
    legs: Sequence[DataFrame],
    id_col: str = "doc_id",
    query_col: str = "query_id",
    k_const: int = 60,
) -> DataFrame:
    """``rrf_fuse`` for BATCHED legs: each leg is an already-truncated
    per-query top-k frame ``(query_col, id_col, score)``; ranks are
    row_numbers WITHIN each query (6dp-rounded score desc, id
    tie-break), fused by ``Σ 1/(k_const + rank)`` with absent-leg
    contribution 0 — the per-query form of the single-query operator,
    so a serving tier fuses Q hybrid requests in one plan.

    Scale: every window partitions by query over Q·k rows (the legs
    truncate BEFORE ranking); the fuse join is full-outer on
    (query, id) over Q·k-row frames — corpus cost lives only in the
    legs, each already scale-audited (batched BM25 / batched cosine).
    """
    from pyspark.sql import Window

    ranked = []
    for i, leg in enumerate(legs):
        w = Window.partitionBy(query_col).orderBy(F.desc("score"), F.col(id_col))
        ranked.append(
            leg.select(
                F.col(query_col),
                F.col(id_col),
                F.row_number().over(w).cast("long").alias(f"rank_{i}"),
            )
        )
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.join(nxt, [query_col, id_col], "full_outer")
    contrib: Column = F.lit(0.0)
    for i in range(len(legs)):
        contrib = contrib + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
    return fused.select(
        F.col(query_col),
        F.col(id_col),
        *[F.col(f"rank_{i}") for i in range(len(legs))],
        F.round(contrib, 6).alias("rrf_score"),
    )


def bm25_topk_batch_against_stats(
    docs: DataFrame,
    queries: Sequence[Sequence[str]],
    term_stats: DataFrame,
    meta: DataFrame,
    k: int,
    n_buckets: int = N_TERM_BUCKETS,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batched BM25 against an EXTERNAL stats artifact — the serving
    hot path: Q queries, ONE pass over the docs being scored, df from
    the hashed-vocabulary (bucket, df) table + (n_docs, n_tokens) meta
    (``corpus_term_stats`` output or the streaming lake's committed
    sum). Returns (query_id, id, score).

    The composition of ``bm25_topk_batch`` (term-union shared tf frame,
    per-query fixed-order chains, salted two-phase top-k) with
    ``bm25_against_stats`` (stats legs collapse to ONE broadcast row of
    conditional sums over the ≤ n_buckets-row artifact — the corpus
    itself is never rescanned for statistics). With the
    ``TermStatsLakeSink`` as the stats source this is what a BM25
    serving tier runs per request batch: corpus cost is amortized into
    the lake's additive ingest, each request batch pays one tokenize
    pass over ITS OWN rows only.
    """
    from .materialize import materialize_once
    from .sampling import domain_cap_salted

    all_terms: list[str] = []
    for q in queries:
        for t in q:
            if t not in all_terms:
                all_terms.append(t)
    idx = {t: i for i, t in enumerate(all_terms)}
    buckets = [term_bucket(t, n_buckets) for t in all_terms]

    # df for every term in the union, off the bounded artifact → 1 row
    df_row = term_stats.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == F.lit(bk), F.col("df"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__df{i}")
            for i, bk in enumerate(buckets)
        ]
    )
    stats = (
        meta.select(
            F.col("n_docs").cast("double").alias("__n"),
            (
                F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
            ).alias("__avgdl"),
        )
        .crossJoin(df_row)
    )
    # one tokenize pass for the tf + length legs (r16 optimization
    # round — same shared-tokenization treatment as bm25_topk_batch;
    # the stats legs read the external artifact, not the corpus)
    tokd = materialize_once(tokenized_docs(docs, id_col, text_col))
    toks = tokd.select(
        F.col(id_col), F.explode(F.col("__toks")).alias("__w")
    )
    tf_aggs = [
        F.sum(F.when(F.col("__w") == F.lit(t), 1).otherwise(0))
        .cast("double")
        .alias(f"__tf{i}")
        for i, t in enumerate(all_terms)
    ]
    lengths = tokd.select(
        F.col(id_col), F.size(F.col("__toks")).cast("double").alias("__dl")
    )
    tf = (
        toks.filter(F.col("__w").isin(all_terms))
        .groupBy(id_col)
        .agg(*tf_aggs)
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    scored = _batch_scores_one_pass(tf, queries, idx, id_col, k1, b)
    top = domain_cap_salted(
        scored, key_col="query_id", quality_col="score", id_col=id_col, k=k
    )
    return top.orderBy("query_id", F.desc("score"), F.col(id_col))


# ------------------------------------------------- shared-tokenization
# variants (the release_report lesson, r13): the one-shot hashed entry
# reads the corpus through FOUR tokenize legs (df, meta, tf, lengths);
# binding the token array once in a materialized (id, __toks) frame
# pays the split/lower/filter once instead of four times. Values are
# identical (same expressions over the same arrays) — pytested.


def tokenized_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, __toks) — the shared tokenized frame. Materialize it
    (operators/materialize.py) when more than one leg consumes it."""
    return docs.select(F.col(id_col), _words(F.col(text_col)).alias("__toks"))


def corpus_term_stats_tokenized(
    tokd: DataFrame,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """``corpus_term_stats`` fed from a (id, __toks) frame."""
    toks = tokd.select(
        F.col(id_col), F.explode(F.col("__toks")).alias("__w")
    ).select(F.col(id_col), _bucket_col(F.col("__w"), n_buckets).alias("bucket"))
    term_stats = (
        toks.select(id_col, "bucket")
        .distinct()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    meta = tokd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.col("__toks"))).alias("n_tokens"),
    )
    return term_stats, meta


def bm25_against_stats_tokenized(
    tokd: DataFrame,
    terms: Sequence[str],
    term_stats: DataFrame,
    meta: DataFrame,
    n_buckets: int = N_TERM_BUCKETS,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
) -> DataFrame:
    """``bm25_against_stats`` fed from a (id, __toks) frame."""
    buckets = [term_bucket(t, n_buckets) for t in terms]
    df_row = term_stats.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bucket") == F.lit(bk), F.col("df"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__df{i}")
            for i, bk in enumerate(buckets)
        ]
    )
    stats = (
        meta.select(
            F.col("n_docs").cast("double").alias("__n"),
            (
                F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
            ).alias("__avgdl"),
        )
        .crossJoin(df_row)
    )
    toks = tokd.select(F.col(id_col), F.explode(F.col("__toks")).alias("__w"))
    tf_aggs = [
        F.sum(F.when(F.col("__w") == F.lit(t), 1).otherwise(0))
        .cast("double")
        .alias(f"__tf{i}")
        for i, t in enumerate(terms)
    ]
    lengths = tokd.select(
        F.col(id_col), F.size(F.col("__toks")).cast("double").alias("__dl")
    )
    tf = (
        toks.filter(F.col("__w").isin(list(terms)))
        .groupBy(id_col)
        .agg(*tf_aggs)
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    return tf.select(
        F.col(id_col), F.round(_score_chain(len(terms), k1, b), 6).alias("score")
    )
