"""tools/scale_replica.py builds the N× datasets behind SCALING.md's
slope numbers; these tests pin the properties that make those slopes
meaningful: linear row growth, 1:1 join fan-out (key offsets), and
rotation-invariant intra-copy embedding structure."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.001"
N = 3


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("replica") / f"x{N}")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "scale_replica.py"), str(N), SRC, out],
        check=True,
        capture_output=True,
    )
    return out


def test_fact_rows_scale_linearly_dims_fixed(spark, replica):
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        base = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        got = spark.read.parquet(f"{replica}/{t}.parquet").count()
        assert got == N * base, (t, base, got)
    for t in ("region", "nation", "supplier", "part"):
        base = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        got = spark.read.parquet(f"{replica}/{t}.parquet").count()
        assert got == base, (t, base, got)


def test_join_fanout_stays_one_to_one(spark, replica):
    """Key offsets must keep equi-joins 1:1 — matched rows grow N×,
    not N²× (the whole point of offsetting)."""

    def joined(d):
        c = spark.read.parquet(f"{d}/customer.parquet")
        o = spark.read.parquet(f"{d}/orders.parquet")
        return c.join(o, c["c_custkey"] == o["o_custkey"]).count()

    assert joined(replica) == N * joined(SRC)


def test_keys_stay_unique(spark, replica):
    for t, k in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")):
        df = spark.read.parquet(f"{replica}/{t}.parquet")
        assert df.count() == df.select(k).distinct().count(), t


def test_embedding_copies_are_rolled_not_duplicated(spark, replica):
    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    b_vec = base.agg(F.max("vec_id")).head()[0] + 1
    rep = spark.read.parquet(f"{replica}/embeddings.parquet")
    rows = {
        r["vec_id"]: list(r["embedding"])
        for r in rep.filter(F.col("vec_id").isin(0, 1, b_vec, b_vec + 1)).collect()
    }
    # copy 1 of vector 0 is a rotation, not a duplicate
    assert rows[b_vec] != rows[0]
    assert sorted(rows[b_vec]) == pytest.approx(sorted(rows[0]))

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    # intra-copy pairwise structure replicates exactly (rotation-invariant)
    assert cos(rows[b_vec], rows[b_vec + 1]) == pytest.approx(cos(rows[0], rows[1]), abs=1e-6)


def test_table_subset_scales_only_named_facts(spark, tmp_path):
    """The r6 ``tables`` arg: only the named fact tables get the N×
    treatment; the rest are written at 1× (so a document-axis study
    doesn't materialize a 600M-row lineitem nobody queries)."""
    out = str(tmp_path / "subset_x2")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "scale_replica.py"), "2", SRC, out,
         "0.0", "documents,embeddings"],
        check=True,
        capture_output=True,
    )
    for t in ("documents", "embeddings"):
        base = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        assert spark.read.parquet(f"{out}/{t}.parquet").count() == 2 * base, t
    for t in ("customer", "orders", "lineitem", "events", "region"):
        base = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        assert spark.read.parquet(f"{out}/{t}.parquet").count() == base, t


def test_bench_compare_noise_normalization(tmp_path, capsys):
    """tools/bench_compare.py: host drift measured by the calibration
    probe must be divided out — a uniform 1.5× slowdown is all noise,
    while a real 2× regression stays flagged."""
    import json
    import runpy
    import sys as _sys

    a = {"value": 2.0, "queries": {"q_steady": 1.0, "q_regressed": 1.0},
         "calibration": {"query": "scan_filter_project", "min": 0.10, "median": 0.11}}
    b = {"value": 4.5, "queries": {"q_steady": 1.5, "q_regressed": 3.0},
         "calibration": {"query": "scan_filter_project", "min": 0.15, "median": 0.16}}
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    argv = _sys.argv
    _sys.argv = ["bench_compare.py", str(pa), str(pb)]
    try:
        runpy.run_path(str(REPO / "tools" / "bench_compare.py"), run_name="__main__")
    finally:
        _sys.argv = argv
    out = capsys.readouterr().out
    assert "x1.50" in out  # host drift detected
    assert "q_steady" in out and "q_steady   " in out or "noise" in out
    lines = {l.split()[0]: l for l in out.splitlines() if l.startswith("q_")}
    assert "noise" in lines["q_steady"]
    assert "SLOWER" in lines["q_regressed"]
    assert "regressions beyond the calibrated noise band: q_regressed" in out
