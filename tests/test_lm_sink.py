"""IncrementalLMSink: additive count deltas, batch ≡ lake score
equality, crash consistency, compaction, unseen-bucket smoothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gomaxscale_spark.operators import sampling as SA
from gomaxscale_spark.streaming.lm_sink import IncrementalLMSink


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


CORPUS = [
    (1, "science history theory physics atom cell", "en"),
    (2, "click buy cheap deal offer win", "xx"),
    (3, "science theory gene atom physics energy", "en"),
    (4, "prize now win offer deal cheap", "xx"),
]


def test_lake_score_equals_batch_operator(spark, tmp_path):
    """Two-batch ingest, then scoring the SAME corpus through the lake
    equals dsir_log_weights on the whole corpus — counts are additive
    and the scoring path is the shared code."""
    sink = IncrementalLMSink(str(tmp_path / "lm1"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    sink.apply_batch(_docs(spark, CORPUS[2:]), 1)
    docs = _docs(spark, CORPUS)
    got = {r["doc_id"]: (r["n_tokens"], r["weight_micro"])
           for r in sink.score(docs).collect()}
    want = {r["doc_id"]: (r["n_tokens"], r["weight_micro"])
            for r in SA.dsir_log_weights(docs, "doc_id", "text",
                                         F.col("lang") == "en", n_buckets=512).collect()}
    assert got == want
    # and the target-like docs outrank the spam under the lake LM
    assert got[1][1] / got[1][0] > got[2][1] / got[2][0]


def test_split_vs_single_batch_identical(spark, tmp_path):
    a = IncrementalLMSink(str(tmp_path / "lm_a"), n_buckets=512)
    a.apply_batch(_docs(spark, CORPUS), 0)
    b = IncrementalLMSink(str(tmp_path / "lm_b"), n_buckets=512)
    for i, row in enumerate(CORPUS):
        b.apply_batch(_docs(spark, [row]), i)
    la = {r["bucket"]: (r["rc"], r["tc"]) for r in a.read_lm(spark).collect()}
    lb = {r["bucket"]: (r["rc"], r["tc"]) for r in b.read_lm(spark).collect()}
    assert la == lb


def test_markerless_epoch_invisible_and_compact_preserves(spark, tmp_path):
    sink = IncrementalLMSink(str(tmp_path / "lm2"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS[:2]), 0)
    sink.apply_batch(_docs(spark, CORPUS[2:]), 1)
    probes = _docs(spark, CORPUS)
    before = sorted(map(tuple, sink.score(probes).collect()))
    # crashed epoch: data, no marker → invisible
    _docs(spark, [(9, "zz zz zz", "en")]).limit(1).selectExpr(
        "cast(1 as bigint) bucket", "cast(99 as bigint) rc", "cast(99 as bigint) tc"
    ).write.parquet(f"{sink.path}/lm/epoch=2")
    assert sorted(map(tuple, sink.score(probes).collect())) == before
    # compact folds committed epochs only; scores unchanged
    sink.compact(spark)
    dirs = [d for d in os.listdir(f"{sink.path}/lm") if d.startswith("epoch=")]
    assert dirs == ["epoch=1"]
    assert sorted(map(tuple, sink.score(probes).collect())) == before
    # retried epoch 2 applies cleanly after its partial was dropped
    sink.apply_batch(_docs(spark, [(9, "fresh tokens arriving", "en")]), 2)
    assert os.path.exists(sink._commit.marker(2))


def test_empty_lake_and_unseen_buckets_smooth(spark, tmp_path):
    """Scoring against an empty lake must not crash: every bucket is
    unseen, add-1 smoothing gives llr = ln(0+B) − ln(0+B) = 0 per
    token → weight 0."""
    sink = IncrementalLMSink(str(tmp_path / "lm3"), n_buckets=512)
    got = sink.score(_docs(spark, CORPUS[:1])).collect()
    assert got[0]["weight_micro"] == 0 and got[0]["n_tokens"] == 6


def test_resample_prefers_target_like(spark, tmp_path):
    sink = IncrementalLMSink(str(tmp_path / "lm4"), n_buckets=512)
    sink.apply_batch(_docs(spark, CORPUS), 0)
    pool = _docs(
        spark,
        [(100 + i, "science physics atom theory gene cell", "raw") for i in range(3)]
        + [(200 + i, "cheap win prize deal buy now", "raw") for i in range(3)],
    )
    picked = {r["doc_id"] for r in sink.resample(pool, k=3).collect()}
    assert picked == {100, 101, 102}, picked
