"""TermStatsLakeSink: additive df/meta deltas, batch ≡ lake BM25 score
equality, crash consistency, compaction, hashed-df vs exact-df shape.
"""

from __future__ import annotations

import os

from gomaxscale_spark.operators import search as SE
from gomaxscale_spark.streaming.term_stats import TermStatsLakeSink


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark join window shuffle"),
    (2, "spark spark filter scan"),
    (3, "window window window agg"),
    (4, "scan filter agg join"),
]
TERMS = ["spark", "window"]


def test_lake_score_equals_batch_operator(spark, tmp_path):
    """Two-batch ingest, then scoring through the lake equals
    bm25_against_stats fed by corpus_term_stats on the whole corpus —
    stats are additive and scoring is the shared _score_chain."""
    sink = TermStatsLakeSink(str(tmp_path / "ts1"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    sink.apply_batch(_docs(spark, CORPUS[2:]), 1)
    docs = _docs(spark, CORPUS)
    got = sorted(map(tuple, sink.score(docs, TERMS).collect()))
    t, m = SE.corpus_term_stats(docs, 512)
    want = sorted(
        map(tuple, SE.bm25_against_stats(docs, TERMS, t, m, 512).collect())
    )
    assert got == want and len(got) == 3  # doc 4 matches no term


def test_split_vs_single_batch_identical(spark, tmp_path):
    a = TermStatsLakeSink(str(tmp_path / "ts_a"), n_buckets=512)
    a.apply_batch(_docs(spark, CORPUS), 0)
    b = TermStatsLakeSink(str(tmp_path / "ts_b"), n_buckets=512)
    for i, row in enumerate(CORPUS):
        b.apply_batch(_docs(spark, [row]), i)
    ta, ma = a.read_stats(spark)
    tb, mb = b.read_stats(spark)
    assert sorted(map(tuple, ta.collect())) == sorted(map(tuple, tb.collect()))
    assert ma.collect() == mb.collect()


def test_hashed_df_matches_exact_when_collision_free(spark, tmp_path):
    """With a roomy bucket space and this tiny vocabulary there are no
    collisions, so hashed-df BM25 must equal the exact-df operator —
    the honest statement of the hashed form's semantics (bucket df ≥
    term df, equality iff collision-free)."""
    docs = _docs(spark, CORPUS)
    t, m = SE.corpus_term_stats(docs, SE.N_TERM_BUCKETS)
    hashed = sorted(
        map(
            tuple,
            SE.bm25_against_stats(docs, TERMS, t, m, SE.N_TERM_BUCKETS).collect(),
        )
    )
    exact = sorted(map(tuple, SE.bm25_scores(docs, TERMS).collect()))
    assert hashed == exact


def test_markerless_epoch_invisible_and_compact_preserves(spark, tmp_path):
    sink = TermStatsLakeSink(str(tmp_path / "ts2"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    sink.apply_batch(_docs(spark, CORPUS[2:]), 1)
    probes = _docs(spark, CORPUS)
    before = sorted(map(tuple, sink.score(probes, TERMS).collect()))
    # crashed epoch: data in BOTH subs, no marker → invisible
    probes.limit(1).selectExpr(
        "cast(1 as bigint) bucket", "cast(99 as bigint) df"
    ).write.parquet(f"{sink.path}/terms/epoch=2")
    probes.limit(1).selectExpr(
        "cast(99 as bigint) n_docs", "cast(999 as bigint) n_tokens"
    ).write.parquet(f"{sink.path}/meta/epoch=2")
    assert sorted(map(tuple, sink.score(probes, TERMS).collect())) == before
    # compact folds committed epochs only; scores unchanged
    sink.compact(spark)
    for sub in ("terms", "meta"):
        dirs = [d for d in os.listdir(f"{sink.path}/{sub}") if d.startswith("epoch=")]
        assert dirs == ["epoch=1"], (sub, dirs)
    assert sorted(map(tuple, sink.score(probes, TERMS).collect())) == before
    # retried epoch 2 applies cleanly after its partials were dropped
    sink.apply_batch(_docs(spark, [(9, "fresh spark doc")]), 2)
    assert os.path.exists(sink._commit.marker(2))
    # and the new doc shifted the stats (df for 'spark' grew)
    after = sorted(map(tuple, sink.score(probes, TERMS).collect()))
    assert after != before


def test_retried_epoch_is_noop(spark, tmp_path):
    sink = TermStatsLakeSink(str(tmp_path / "ts3"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    t1, m1 = sink.read_stats(spark)
    snap = (sorted(map(tuple, t1.collect())), m1.collect())
    sink.apply_batch(_docs(spark, CORPUS[2:]), 0)  # same epoch id → no-op
    t2, m2 = sink.read_stats(spark)
    assert (sorted(map(tuple, t2.collect())), m2.collect()) == snap


def test_topk_ranks_by_lake_stats(spark, tmp_path):
    sink = TermStatsLakeSink(str(tmp_path / "ts4"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS), 0)
    top = sink.topk(_docs(spark, CORPUS), ["window"], k=1).collect()
    assert top[0]["doc_id"] == 3  # tf=3 for 'window'


def test_topk_batch_lake_equals_batch_artifact(spark, tmp_path):
    """r14 serving hot path: lake.topk_batch (Q queries, one pass,
    df/avgdl from the committed epoch sum) equals
    bm25_topk_batch_against_stats fed by corpus_term_stats on the
    whole corpus — additive deltas give identical counts, the shared
    chains give bit-equal scores."""
    sink = TermStatsLakeSink(str(tmp_path / "ts5"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    sink.apply_batch(_docs(spark, CORPUS[2:]), 1)
    docs = _docs(spark, CORPUS)
    queries = [["spark", "window"], ["scan", "agg"]]
    cols = ["query_id", "doc_id", "score"]
    got = sorted(
        map(tuple, sink.topk_batch(docs, queries, k=2).select(*cols).collect())
    )
    t, m = SE.corpus_term_stats(docs, 512)
    want = sorted(
        map(
            tuple,
            SE.bm25_topk_batch_against_stats(
                docs, queries, t, m, k=2, n_buckets=512
            )
            .select(*cols)
            .collect(),
        )
    )
    assert got == want and len(got) == 4  # 2 queries × top-2

    # and the batched-against-stats form agrees with the per-query
    # hashed operator on each leg (same artifact, same chain)
    for qid, terms in enumerate(queries):
        leg = sorted(
            t_ for t_ in got if t_[0] == qid
        )
        single = (
            SE.bm25_against_stats(docs, terms, t, m, 512)
            .orderBy("score", ascending=False)
            .collect()
        )
        single = sorted(
            (qid, r.doc_id, r.score)
            for r in sorted(single, key=lambda r: (-r.score, r.doc_id))[:2]
        )
        assert leg == single
