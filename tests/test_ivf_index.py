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


def test_incremental_add_probed(spark, sf_dir, tmp_path):
    """add(): vectors inserted after build land in their nearest
    existing cell and are probe-visible; the index holds the union."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    first, second = (
        emb.filter(F.col("vec_id") <= cut),
        emb.filter(F.col("vec_id") > cut),
    )
    idx = IVFIndex(str(tmp_path / "ivf_add"))
    built_stats = idx.build(first, n_iters=1)
    assert idx.add(second) == {"added": second.count()}
    total = spark.read.parquet(f"{idx.path}/vectors").count()
    assert total == built_stats["n_vectors"] + second.count()

    # an added vector is its own nearest neighbour under the probe
    probe_id = max(ids)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == probe_id).head().embedding
    ]
    top = idx.probe(spark, q, k=3, n_probe=1).collect()
    assert top and (top[0].vec_id == probe_id or top[0].score == 1.0)
