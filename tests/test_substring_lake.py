"""SubstringKeyLakeSink: the streaming span-decontamination surface —
epoch-commit crash consistency, probe ≡ batch-operator equality, the
set-semantics incremental ingest, compaction, and the lake-never-
shuffled probe plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gomaxscale_spark.operators import dedup as D
from gomaxscale_spark.streaming.sinks import SubstringKeyLakeSink

W = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH0 = [(1, "q r s t u aa bb cc"), (2, "dd ee ff gg hh ii")]
BATCH1 = [(3, "q r s t u zz yy"), (4, "new content words here now")]
PROBES = [(100, "xx q r s t u xx"), (101, "nothing from the lake corpus")]


def _fill(spark, tmp_path, **kw):
    sink = SubstringKeyLakeSink(str(tmp_path / "sslake"), window=W, **kw)
    sink.apply_batch(_docs(spark, BATCH0), 0)
    sink.apply_batch(_docs(spark, BATCH1), 1)
    return sink


def test_probe_equals_batch_operator(spark, tmp_path):
    sink = _fill(spark, tmp_path)
    probes = _docs(spark, PROBES)
    got = {r["doc_id"]: (r["lake_tokens"], r["lake_coverage"])
           for r in sink.probe_coverage(probes).collect()}
    hist = _docs(spark, BATCH0 + BATCH1)
    want = {r["doc_id"]: (r["lake_tokens"], r["lake_coverage"])
            for r in D.incremental_substring_coverage(probes, hist, "doc_id", "text", window=W).collect()}
    assert got == want
    assert got[100][0] == 5 and got[101][0] == 0  # the shared run; the clean probe


def test_ingest_is_set_semantics(spark, tmp_path):
    """Re-ingesting overlapping content stores only NEW keys — the
    second epoch of an identical batch is empty and the lake key count
    equals the distinct window count of the union."""
    sink = SubstringKeyLakeSink(str(tmp_path / "sslake2"), window=W)
    sink.apply_batch(_docs(spark, BATCH0), 0)
    n0 = sink.read_keys(spark).count()
    sink.apply_batch(_docs(spark, BATCH0), 1)  # same content again
    assert sink.read_keys(spark).count() == n0
    distinct_windows = (
        D.substring_window_positions(_docs(spark, BATCH0), "doc_id", "text", W)
        .select("wh").distinct().count()
    )
    assert n0 == distinct_windows


def test_markerless_epoch_is_invisible_and_retry_recovers(spark, tmp_path):
    sink = _fill(spark, tmp_path)
    before = sink.probe_coverage(_docs(spark, PROBES)).collect()
    # simulate a crashed epoch 2: data dir present, no marker
    crashed = f"{sink.path}/keys/epoch=2"
    _docs(spark, [(9, "w1 w2 w3 w4 w5 w6")]).selectExpr(
        "cast(hash(text) as bigint) as wh"
    ).write.parquet(crashed)
    assert sink.probe_coverage(_docs(spark, PROBES)).collect() == before
    assert sink.read_keys(spark).count() == len(
        {r["wh"] for r in sink.read_keys(spark).collect()}
    )
    # the stream retries epoch 2: partial dropped, epoch applies cleanly
    sink.apply_batch(_docs(spark, [(9, "p4 p5 p6 p7 p8")]), 2)
    assert os.path.exists(sink._commit.marker(2))
    # retried again (foreachBatch replay) → no-op, count stable
    n = sink.read_keys(spark).count()
    sink.apply_batch(_docs(spark, [(9, "p4 p5 p6 p7 p8")]), 2)
    assert sink.read_keys(spark).count() == n


def test_compact_folds_epochs_and_preserves_probe(spark, tmp_path):
    sink = _fill(spark, tmp_path)
    sink.apply_batch(_docs(spark, [(5, "more lake words arriving here")]), 2)
    probes = _docs(spark, PROBES)
    before = sorted(map(tuple, sink.probe_coverage(probes).collect()))
    n_keys = sink.read_keys(spark).count()
    sink.compact(spark)
    dirs = [d for d in os.listdir(f"{sink.path}/keys") if d.startswith("epoch=")]
    assert dirs == ["epoch=2"]
    assert sink.read_keys(spark).count() == n_keys
    assert sorted(map(tuple, sink.probe_coverage(probes).collect())) == before


def test_auto_compact_cadence(spark, tmp_path):
    sink = SubstringKeyLakeSink(str(tmp_path / "sslake3"), window=W, compact_every=2)
    sink.apply_batch(_docs(spark, BATCH0), 0)
    sink.apply_batch(_docs(spark, BATCH1), 1)  # triggers compaction at 2 dirs
    dirs = [d for d in os.listdir(f"{sink.path}/keys") if d.startswith("epoch=")]
    assert len(dirs) == 1


def test_empty_lake_probe_is_zero_coverage(spark, tmp_path):
    sink = SubstringKeyLakeSink(str(tmp_path / "sslake4"), window=W)
    got = sink.probe_coverage(_docs(spark, PROBES)).collect()
    assert {r["doc_id"]: r["lake_coverage"] for r in got} == {100: 0.0, 101: 0.0}


def test_probe_never_shuffles_the_lake(spark, tmp_path):
    """The probe's key-matching joins are broadcast (probe side built):
    the lake key store is scanned, never repartitioned. The only
    wh-keyed exchanges allowed are the two PROBE-side distincts
    (bounded by the probe's own key count); a lake repartition would
    show as a third wh exchange + a SortMergeJoin."""
    sink = _fill(spark, tmp_path)
    p = (
        sink.probe_coverage(_docs(spark, PROBES))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no shuffle join on the window key (the doc_id report join over
    # the probe-sized frames may sort-merge — that's not the lake)
    assert "SortMergeJoin [wh" not in p and "ShuffledHashJoin [wh" not in p
    wh_exchanges = [
        seg.splitlines()[0]
        for seg in p.split("Exchange hashpartitioning(")[1:]
        if seg.splitlines()[0].startswith("wh")
    ]
    assert len(wh_exchanges) <= 2, wh_exchanges
    assert p.count("BroadcastHashJoin") >= 2  # lake-semi + hits-semi


def test_contamination_report_online(spark, tmp_path):
    """The online composite over both lakes: a verbatim-copy probe
    reports jaccard 1.0 AND span coverage 1.0; a fresh probe reports
    zeros on both methods; every (probe × method) row is present."""
    from gomaxscale_spark.streaming.sinks import (
        IncrementalLSHDedupSink,
        contamination_report_online,
    )

    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog while the cat watches"),
            (2, "completely different content about distributed query engines today"),
        ],
    )
    lsh = IncrementalLSHDedupSink(str(tmp_path / "lsh_lake"), threshold=0.8)
    lsh.apply_batch(corpus, 0)
    keys = SubstringKeyLakeSink(str(tmp_path / "key_lake"), window=W)
    keys.apply_batch(corpus, 0)

    probes = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog while the cat watches"),
            (101, "totally novel probe text never seen anywhere in the lake"),
        ],
    )
    rep = {
        (r["doc_id"], r["method"]): r["evidence"]
        for r in contamination_report_online(lsh, keys, probes).collect()
    }
    assert len(rep) == 4  # 2 probes x 2 methods, zeros kept
    assert rep[(100, "near_dup_jaccard")] == 1.0
    assert rep[(100, "span_coverage")] == 1.0
    assert rep[(101, "near_dup_jaccard")] == 0.0
    assert rep[(101, "span_coverage")] == 0.0


def test_release_report_online_adds_lm_modality(spark, tmp_path):
    """VERDICT r10 item 6: the release gate composes the two
    contamination signals with the streaming DSIR LM score — one
    (probe × method) artifact, committed-epoch reads only. A verbatim
    English probe reads leak evidence 1.0 on both contamination
    methods AND a higher per-token DSIR weight than an off-target
    probe; every probe carries all three method rows (zeros kept)."""
    from gomaxscale_spark.streaming.lm_sink import IncrementalLMSink
    from gomaxscale_spark.streaming.sinks import (
        IncrementalLSHDedupSink,
        release_report_online,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog while the cat watches", "en"),
            (2, "zzq wwk qqv bbn mmx vvc kkl ppo iiu yyt rre wwz", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    lsh = IncrementalLSHDedupSink(str(tmp_path / "lsh_lake"), threshold=0.8)
    lsh.apply_batch(corpus.select("doc_id", "text"), 0)
    keys = SubstringKeyLakeSink(str(tmp_path / "key_lake"), window=W)
    keys.apply_batch(corpus.select("doc_id", "text"), 0)
    lm = IncrementalLMSink(str(tmp_path / "lm_lake"), target_sql="lang = 'en'")
    lm.apply_batch(corpus, 0)

    probes = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog while the cat watches"),
            (101, "zzq wwk qqv bbn mmx vvc kkl ppo iiu yyt rre wwz"),
        ],
        "doc_id long, text string",
    )
    rep = {
        (r["doc_id"], r["method"]): r["evidence"]
        for r in release_report_online(lsh, keys, lm, probes).collect()
    }
    assert len(rep) == 6  # 2 probes x 3 methods
    assert rep[(100, "near_dup_jaccard")] == 1.0
    assert rep[(100, "span_coverage")] == 1.0
    # the English probe is more target-like than the off-target one
    assert (
        rep[(100, "dsir_logweight_per_token")]
        > rep[(101, "dsir_logweight_per_token")]
    )

    # empty LM lake → LM evidence exactly 0, contamination rows intact
    lm_empty = IncrementalLMSink(str(tmp_path / "lm_empty"))
    rep0 = {
        (r["doc_id"], r["method"]): r["evidence"]
        for r in release_report_online(lsh, keys, lm_empty, probes).collect()
    }
    assert rep0[(100, "dsir_logweight_per_token")] == 0.0
    assert rep0[(100, "span_coverage")] == 1.0
