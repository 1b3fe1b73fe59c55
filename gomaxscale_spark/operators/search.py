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
    """
    toks = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("__w")
    )
    # 1-row corpus stats: N, avgdl, and df per query term — partial-
    # aggregable conditional counts, broadcast into the scoring join.
    df_aggs = [
        F.count_distinct(
            F.when(F.col("__w") == F.lit(t), F.col(id_col))
        ).alias(f"__df{i}")
        for i, t in enumerate(terms)
    ]
    stats = toks.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("__n"), *df_aggs
    ).crossJoin(
        docs.agg(
            F.avg(F.size(_words(F.col(text_col)))).alias("__avgdl")
        )
    )
    # per-doc: length + tf per query term, one hash agg (map-side fold)
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
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("__dl") / F.col("__avgdl")
    )
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        score = score + idf * F.col(f"__tf{i}") / (F.col(f"__tf{i}") + norm)
    return tf.select(F.col(id_col), F.round(score, 6).alias("score"))


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
