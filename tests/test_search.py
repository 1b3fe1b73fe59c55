"""Retrieval operators (r13): BM25, RRF fusion, deterministic shuffle.

Semantics on hand-built frames + the scale-shape pins the plan audit
wants (BM25 top-k is TakeOrderedAndProject, shuffle-shards is ONE
exchange keyed by shard).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gomaxscale_spark.operators import search as SE
from gomaxscale_spark.operators.sampling import deterministic_shuffle
from gomaxscale_spark.plans import all_queries

QUERIES = all_queries()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed(spark):
    # 3 docs, query = ['cat']: df=2, N=3, avgdl = (2+3+4)/3 = 3.0
    d = _docs(
        spark,
        [(0, "cat mat"), (1, "cat cat dog"), (2, "bird bird bird bird")],
    )
    got = {
        r.doc_id: r.score
        for r in SE.bm25_scores(d, ["cat"]).collect()
    }
    assert set(got) == {0, 1}  # doc 2 never matches → absent
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))

    def bm25(tf, dl):
        return idf * tf / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    assert got[0] == round(bm25(1, 2), 6)
    assert got[1] == round(bm25(2, 3), 6)
    # higher tf with comparable length must score higher
    assert got[1] > got[0]


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' in 1/4 docs, 'common' in 4/4: one hit on the rare term must
    # outrank one hit on the common term at equal doc length.
    d = _docs(
        spark,
        [
            (0, "rare filler filler"),
            (1, "common filler filler"),
            (2, "common filler filler"),
            (3, "common filler filler"),
        ],
    )
    s = {
        r.doc_id: r.score
        for r in SE.bm25_scores(d, ["rare", "common"]).collect()
    }
    assert s[0] > s[1] == s[2] == s[3]


def test_rrf_fuse_conventions(spark):
    # leg A ranks 10,20; leg B ranks 20,30 — doc 20 gets both legs,
    # docs 10/30 get exactly one (absent leg contributes 0).
    a = spark.createDataFrame([(10, 0.9), (20, 0.8)], "doc_id long, score double")
    b = spark.createDataFrame([(20, 0.7), (30, 0.6)], "doc_id long, score double")
    rows = {r.doc_id: r for r in SE.rrf_fuse([a, b]).collect()}
    assert rows[20].rrf_score == round(1 / 62 + 1 / 61, 6)
    assert rows[10].rrf_score == round(1 / 61, 6)
    assert rows[30].rrf_score == round(1 / 62, 6)
    assert rows[10].rank_1 is None and rows[30].rank_0 is None
    # both-legs doc outranks either single-leg doc
    assert rows[20].rrf_score > rows[10].rrf_score > rows[30].rrf_score


def test_rrf_rank_ties_break_on_id(spark):
    # equal scores inside a leg → rank order = id order, both rows kept
    a = spark.createDataFrame([(2, 0.5), (1, 0.5)], "doc_id long, score double")
    rows = {r.doc_id: r.rank_0 for r in SE.rrf_fuse([a, a]).collect()}
    assert rows == {1: 1, 2: 2}


def test_deterministic_shuffle_invariants(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    out = deterministic_shuffle(d, "doc_id", n_shards=8, seed="seed13")
    pdf = out.toPandas()
    assert len(pdf) == n  # a shuffle is a permutation: nothing dropped
    assert pdf["doc_id"].is_unique
    assert set(pdf["shard"].unique()) <= set(range(8))
    # positions are contiguous 1..|shard| inside every shard
    for shard, grp in pdf.groupby("shard"):
        assert sorted(grp["position"]) == list(range(1, len(grp) + 1))
    # reproducible: same seed → same frame; new seed → different order
    again = deterministic_shuffle(d, "doc_id", n_shards=8, seed="seed13")
    assert out.exceptAll(again).count() == 0
    other = deterministic_shuffle(d, "doc_id", n_shards=8, seed="epoch2")
    assert other.exceptAll(out).count() > 0


def _plan(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_bm25_topk_plan(spark, sf_dir):
    p = _plan(spark, sf_dir, "search_bm25_topk")
    assert "TakeOrderedAndProject(limit=15" in p
    # corpus stats enter as a 1-row broadcast, never a shuffle join
    assert "BroadcastExchange" in p
    assert "Window" not in p, "global window crept into the scoring path"


def test_shuffle_shards_single_exchange(spark, sf_dir):
    p = _plan(spark, sf_dir, "corpus_shuffle_shards")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Exchange hashpartitioning(shard" in p
    assert "rangepartitioning" not in p, "global sort crept in"


def test_bloom_prefilter_superset_and_size(spark, sf_dir):
    """Bloom hits must be a superset of exact hits per doc (one-sided
    error only), and the filter artifact is bounded by its geometry
    (≤ ceil(m/60) words) whatever the benchmark size."""
    from gomaxscale_spark.operators import sampling as SA
    from gomaxscale_spark.operators import text as TX
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "bucket", SA.hash_bucket(F.col("doc_id"))
    )
    bench = d.filter(F.col("bucket") < 5)
    corpus = d.filter(F.col("bucket") >= 5)
    out = TX.bloom_decontaminate(corpus, bench, "doc_id", "text").collect()
    assert out, "no bloom-positive docs at all"
    for r in out:
        assert r.bloom_hits >= r.exact_hits >= 0
        assert r.total_ngrams >= r.bloom_hits
    n_words = TX.bloom_build(bench, "text").count()
    assert n_words <= (TX.BLOOM_M + TX.BLOOM_WORD_BITS - 1) // TX.BLOOM_WORD_BITS


def test_bm25_exact_equals_hashed_with_empty_docs(spark):
    """The r13 ADVICE invariant: N counts ALL corpus rows in BOTH the
    exact and hashed-df paths, so on a collision-free vocabulary the
    two forms stay bit-equal even when the corpus contains empty /
    whitespace-only documents (which tokenize to zero rows)."""
    d = _docs(
        spark,
        [
            (0, "cat mat"),
            (1, "cat cat dog"),
            (2, "bird bird bird bird"),
            (3, ""),            # empty doc — no tokens
            (4, "   "),         # whitespace-only — no tokens
        ],
    )
    terms = ["cat", "bird"]
    exact = sorted(map(tuple, SE.bm25_scores(d, terms).collect()))
    ts, meta = SE.corpus_term_stats(d)
    hashed = sorted(
        map(tuple, SE.bm25_against_stats(d, terms, ts, meta).collect())
    )
    assert exact == hashed
    # and N really is 5 (all rows): idf for 'cat' (df=2) must replay
    idf = math.log(1.0 + (5 - 2 + 0.5) / (2 + 0.5))
    avgdl = (2 + 3 + 4 + 0 + 0) / 5.0
    want0 = round(idf * 1 / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl)), 6)
    got = {r[0]: r[1] for r in exact}
    assert got[0] == want0
