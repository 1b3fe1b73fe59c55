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
