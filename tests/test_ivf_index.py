"""The materialized IVF index (operators/ivf_index.py): build once,
probe via partition-pruned reads — exactness inside the probed cells,
the file-pruning contract, and self-lookup recall."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.ivf_index import IVFIndex


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex(str(tmp_path_factory.mktemp("ivf") / "index"))
    stats = idx.build(emb, n_iters=1)
    return idx, emb, stats


def test_build_stats_and_layout(spark, built):
    import os

    idx, emb, stats = built
    assert stats["n_vectors"] == emb.count()
    assert stats["n_centroids"] >= 4
    cells = [
        d
        for d in os.listdir(f"{idx.path}/vectors")
        if d.startswith("centroid_id=")
    ]
    assert 1 < len(cells) <= stats["n_centroids"]
    # every vector landed in exactly one cell
    assert (
        spark.read.parquet(f"{idx.path}/vectors").count() == stats["n_vectors"]
    )


def test_probe_exact_within_probed_cells(spark, built):
    """The probe is EXACT inside its cells: numpy brute-force over the
    probed partitions' vectors must reproduce ids, 6dp scores, and
    order."""
    idx, emb, _ = built
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    got = idx.probe(spark, q, k=10, n_probe=4).collect()
    assert 0 < len(got) <= 10

    cells = idx._probe_cells(spark, q, 4)
    probed = (
        spark.read.parquet(f"{idx.path}/vectors")
        .filter(F.col("centroid_id").isin(cells))
        .collect()
    )
    qv = np.asarray(q)
    exp = []
    for r in probed:
        v = np.asarray(list(r.embedding), dtype=np.float64)
        s = float(v @ qv / (np.sqrt(v @ v) * np.sqrt(qv @ qv)))
        exp.append((r.vec_id, round(s, 6)))
    exp.sort(key=lambda t: (-t[1], t[0]))
    assert [(r.vec_id, r.score) for r in got] == exp[: len(got)]


def test_probe_prunes_partitions(spark, built):
    """The pruning contract: centroid_id IN (...) must reach the file
    index, so the probed scan's input splits cover only the probed
    cells' files — far fewer than the full index. (inputFiles() can't
    pin this: it lists the relation's files pre-filter; the scan RDD's
    partition count reflects the files actually selected.)"""
    idx, emb, stats = built
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    cells = idx._probe_cells(spark, q, 2)
    pruned_scan = spark.read.parquet(f"{idx.path}/vectors").filter(
        F.col("centroid_id").isin(cells)
    )
    full_scan = spark.read.parquet(f"{idx.path}/vectors")
    n_pruned = pruned_scan.rdd.getNumPartitions()
    n_full = full_scan.rdd.getNumPartitions()
    assert 0 < n_pruned <= len(cells) < n_full
    # and the rows really are only the probed cells'
    assert {
        r.centroid_id for r in pruned_scan.select("centroid_id").distinct().collect()
    } <= set(cells)


def test_probe_self_lookup(spark, built):
    """An indexed vector's own cell is by construction its nearest
    centroid, so self-lookup always probes the right cell and returns
    the vector first."""
    idx, emb, _ = built
    some_id = emb.select(F.max("vec_id")).head()[0]
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == some_id).head().embedding
    ]
    top = idx.probe(spark, q, k=3, n_probe=1).collect()
    assert top[0].vec_id == some_id or top[0].score == 1.0


def test_build_empty_corpus_rejected(spark, built, tmp_path):
    idx2 = IVFIndex(str(tmp_path / "empty_idx"))
    _, emb, _ = built
    with pytest.raises(ValueError, match="empty corpus"):
        idx2.build(emb.filter(F.lit(False)))


def test_probe_batch_equals_per_query_probes(spark, built):
    """probe_batch must return, per query, exactly probe()'s rows
    (same ids and 6dp scores in rank order)."""
    idx, emb, _ = built
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(4).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in idx.probe_batch(queries, k=6, n_probe=3).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid in qids:
        got[qid].sort(key=lambda t: (-t[1], t[0]))
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).head().embedding
        ]
        single = [
            (r.vec_id, r.score)
            for r in idx.probe(spark, q, k=6, n_probe=3).collect()
        ]
        assert got[qid] == single, f"query {qid} diverged"


def test_probe_batch_empty_queries(spark, built):
    idx, emb, _ = built
    empty = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert idx.probe_batch(empty, k=3).count() == 0


def _split_corpus(emb):
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    return (
        emb.filter(F.col("vec_id") <= cut),
        emb.filter(F.col("vec_id") > cut),
        max(ids),
    )


def test_incremental_add_probed(spark, sf_dir, tmp_path):
    """add(): vectors inserted after build land in their nearest
    existing cell as a COMMITTED epoch and are probe-visible; the
    probe-visible dataset holds the union."""
    emb = load_table(spark, sf_dir, "embeddings")
    first, second, probe_id = _split_corpus(emb)
    idx = IVFIndex(str(tmp_path / "ivf_add"))
    built_stats = idx.build(first, n_iters=1)
    res = idx.add(second)
    assert res["added"] == second.count() and res["epoch"] == 0
    total = idx._read_vectors(spark).count()
    assert total == built_stats["n_vectors"] + second.count()

    # an added vector is its own nearest neighbour under the probe
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == probe_id).head().embedding
    ]
    top = idx.probe(spark, q, k=3, n_probe=1).collect()
    assert top and (top[0].vec_id == probe_id or top[0].score == 1.0)


def test_add_crash_before_commit_invisible_then_retry(spark, sf_dir, tmp_path):
    """VERDICT r9 item 2 fault injection: a crash between the add's
    parquet write and its marker leaves the epoch UNCOMMITTED — every
    probe sees exactly the pre-add corpus; the retried add cleans the
    partial dir and completes; probes then see the union."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    first, second, probe_id = _split_corpus(emb)
    idx = IVFIndex(str(tmp_path / "ivf_crash"))
    idx.build(first, n_iters=1)
    n_base = first.count()

    # crash injection: run the real add, then delete the marker —
    # on-disk state identical to dying just before commit()
    res = idx.add(second)
    os.remove(idx._ec.marker(res["epoch"]))
    assert os.path.isdir(f"{idx.path}/adds/epoch={res['epoch']}")

    assert idx._read_vectors(spark).count() == n_base  # probe-invisible
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == probe_id).head().embedding
    ]
    got = {r.vec_id for r in idx.probe(spark, q, k=500, n_probe=64).collect()}
    assert probe_id not in got

    # retry: preamble deletes the markerless dir, add completes
    res2 = idx.add(second)
    assert res2["added"] == second.count()
    assert idx._read_vectors(spark).count() == n_base + second.count()
    top = idx.probe(spark, q, k=3, n_probe=1).collect()
    assert top and (top[0].vec_id == probe_id or top[0].score == 1.0)


def test_probe_after_add_equals_rebuilt_cells(spark, sf_dir, tmp_path):
    """Probe-after-add equality: with every cell probed (n_probe =
    k_cells) the add-path index returns the identical top-k the exact
    scan over base ∪ adds does — the epoch layout changes storage,
    never results."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    first, second, probe_id = _split_corpus(emb)
    idx = IVFIndex(str(tmp_path / "ivf_eq"))
    stats = idx.build(first, n_iters=1)
    idx.add(second)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == probe_id).head().embedding
    ]
    got = [
        (r.vec_id, r.score)
        for r in idx.probe(spark, q, k=10, n_probe=stats["n_centroids"]).collect()
    ]
    qv = np.asarray(q)
    exp = []
    for r in emb.collect():
        v = np.asarray(list(r.embedding), dtype=np.float64)
        s = float(v @ qv / (np.sqrt(v @ v) * np.sqrt(qv @ qv)))
        exp.append((r.vec_id, round(s, 6)))
    exp.sort(key=lambda t: (-t[1], t[0]))
    assert got == exp[:10]


def test_compact_adds_folds_epochs_atomically(spark, sf_dir, tmp_path):
    """compact_adds(): results identical before/after; the manifest
    rides inside the swapped dataset so a probe never double-counts a
    folded-but-not-yet-GC'd epoch; a second compact is a no-op."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    first, second, probe_id = _split_corpus(emb)
    idx = IVFIndex(str(tmp_path / "ivf_compact"))
    idx.build(first, n_iters=1)
    idx.add(second)
    n_all = emb.count()
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == probe_id).head().embedding
    ]
    before = [(r.vec_id, r.score) for r in idx.probe(spark, q, k=8, n_probe=4).collect()]

    assert idx.compact_adds() == {"folded_epochs": 1}
    assert idx._read_vectors(spark).count() == n_all
    after = [(r.vec_id, r.score) for r in idx.probe(spark, q, k=8, n_probe=4).collect()]
    assert before == after

    # double-count guard: even if GC had crashed (recreate the folded
    # epoch dir), the manifest keeps it invisible
    os.makedirs(f"{idx.path}/adds/epoch=0", exist_ok=True)
    open(idx._ec.marker(0), "w").close()
    assert 0 in idx._folded_epochs()
    assert idx._committed_add_dirs() == []
    assert idx._read_vectors(spark).count() == n_all

    assert idx.compact_adds() == {"folded_epochs": 0}  # no-op + GC


def test_add_compact_mutual_exclusion(spark, sf_dir, tmp_path):
    """A racing add/compact pair raises loudly (sentinel pair) instead
    of corrupting the layout."""
    import os

    import pytest as _pytest

    emb = load_table(spark, sf_dir, "embeddings")
    first, second, _ = _split_corpus(emb)
    idx = IVFIndex(str(tmp_path / "ivf_race"))
    idx.build(first, n_iters=1)
    os.makedirs(idx.path, exist_ok=True)
    open(f"{idx.path}/_inflight_maintenance", "w").close()
    with _pytest.raises(RuntimeError, match="race"):
        idx.add(second)
    os.remove(f"{idx.path}/_inflight_maintenance")
    open(f"{idx.path}/_inflight_batch", "w").close()
    with _pytest.raises(RuntimeError, match="race"):
        idx.compact_adds()
    os.remove(f"{idx.path}/_inflight_batch")


def test_probe_batch_string_query_ids(spark, sf_dir, built):
    """ADVICE r9: query ids pass through with their own type — string
    ids probe fine, and the empty-input schema matches the non-empty
    path's types."""
    idx, emb, _ = built
    queries = (
        emb.orderBy("vec_id")
        .limit(2)
        .select(
            F.concat(F.lit("q-"), F.col("vec_id").cast("string")).alias("query_id"),
            "embedding",
        )
    )
    got = idx.probe_batch(queries, k=3, n_probe=2).collect()
    assert got and all(r.query_id.startswith("q-") for r in got)

    empty = queries.filter(F.lit(False))
    edf = idx.probe_batch(empty, k=3)
    assert edf.count() == 0
    assert [f.dataType.simpleString() for f in edf.schema.fields] == [
        "string",
        "bigint",
        "double",
    ]
    assert [f.name for f in edf.schema.fields] == ["query_id", "vec_id", "score"]


def test_serving_tiers_compose_lake_to_index(spark, sf_dir, tmp_path):
    """VERDICT r9 item 5 — the documented serving loop: stream batches
    into the continuous embedding lake, build the static IVFIndex from
    ``read_kept()`` on a compaction cadence, serve probes from the
    index between rebuilds.

    Exactness contract: with n_probe = k_cells the index probe scans
    every cell, so ``index.probe_batch`` must equal the exact
    brute-force cosine top-k over the SAME kept corpus bit-for-bit at
    the 6dp contract. The lake's own ``topk_batch`` is band-bucket
    APPROXIMATE by design, so it is checked on its contract instead:
    per-query rows are a subset of the exact scored universe with
    identical 6dp scores, and a lake-member self-query's top hit is
    itself (it shares every band bucket with itself)."""
    import numpy as np

    from gomaxscale_spark.catalog import load_table
    from gomaxscale_spark.streaming.embedding_index import (
        IncrementalEmbeddingIndexSink,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]

    # 1. stream two micro-batches into the lake
    lake = IncrementalEmbeddingIndexSink(str(tmp_path / "lake"), threshold=0.3)
    lake.apply_batch(emb.filter(F.col("vec_id") <= cut), 0)
    lake.apply_batch(emb.filter(F.col("vec_id") > cut), 1)
    kept = lake.read_kept(spark)
    n_kept = kept.count()
    assert 0 < n_kept <= len(ids)

    # 2. compaction-cadence rebuild: the index is built FROM the lake
    idx = IVFIndex(str(tmp_path / "idx"))
    stats = idx.build(kept, n_iters=1)
    assert stats["n_vectors"] == n_kept
    k_cells = stats["n_centroids"]

    # 3. probes served from the index ≡ exact top-k over the kept corpus
    queries = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in idx.probe_batch(queries, k=5, n_probe=k_cells).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.score))
    kept_rows = [(r.vec_id, np.asarray(list(r.embedding), dtype=np.float64))
                 for r in kept.collect()]
    exact_all = {}
    for q in queries.collect():
        qv = np.asarray(list(q.embedding), dtype=np.float64)
        scored = {
            vid: round(float(v @ qv / (np.sqrt(v @ v) * np.sqrt(qv @ qv))), 6)
            for vid, v in kept_rows
        }
        exact_all[q.query_id] = scored
        exp = sorted(scored.items(), key=lambda t: (-t[1], t[0]))[:5]
        gq = sorted(got[q.query_id], key=lambda t: (-t[1], t[0]))
        assert gq == exp, f"query {q.query_id}: index != exact"

    # 4. the lake's own probe honors its approximate contract
    lk = {}
    for r in lake.topk_batch(queries, k=5).collect():
        lk.setdefault(r.query_id, []).append((r.vec_id, r.score))
    for qid, rows in lk.items():
        for vid, score in rows:
            assert exact_all[qid].get(vid) == score
    member_qid = queries.agg(F.min("query_id")).head()[0]
    kept_ids = {vid for vid, _ in kept_rows}
    if member_qid in kept_ids:
        top1 = max(lk[member_qid], key=lambda t: (t[1], -t[0]))
        assert top1[0] == member_qid or top1[1] == 1.0
