"""r16 family wave 2: preference-data QA (operators/preference.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gomaxscale_spark.operators.preference import (
    annotator_agreement,
    bradley_terry,
    pairwise_matrix,
)


def _cmp(spark, rows):
    return spark.createDataFrame(
        rows, "pair long, a string, b string, winner string"
    )


def test_pairwise_matrix_canonicalizes_and_drops_self_pairs(spark):
    c = _cmp(
        spark,
        [
            (1, "x", "y", "a"),   # x beats y
            (2, "y", "x", "a"),   # y beats x (reversed column order)
            (3, "y", "x", "b"),   # x beats y
            (4, "x", "x", "a"),   # self-pair -> dropped
            (5, "x", "z", "b"),   # z beats x
        ],
    )
    rows = {(r.item_a, r.item_b): r for r in
            pairwise_matrix(c, "a", "b", "winner").collect()}
    assert set(rows) == {("x", "y"), ("x", "z")}
    xy = rows[("x", "y")]
    assert xy.wins_a == 2 and xy.wins_b == 1 and xy.n_games == 3
    xz = rows[("x", "z")]
    assert xz.wins_a == 0 and xz.wins_b == 1


def test_bradley_terry_orders_by_true_strength(spark):
    """Deterministic round-robin where x beats everyone, y beats z:
    the fit must rank x > y > z and strengths must sum to ~1."""
    games = []
    pid = 0
    for _ in range(10):
        for a, b, w in (("x", "y", "a"), ("x", "z", "a"), ("y", "z", "a")):
            pid += 1
            games.append((pid, a, b, w))
    # give the losers a few wins so no strength collapses to 0
    for a, b, w in (("x", "y", "b"), ("x", "z", "b"), ("y", "z", "b")):
        pid += 1
        games.append((pid, a, b, w))
    m = pairwise_matrix(_cmp(spark, games), "a", "b", "winner")
    fit = {r.item: r for r in bradley_terry(m, n_iters=8).collect()}
    assert fit["x"].rank == 1 and fit["y"].rank == 2 and fit["z"].rank == 3
    assert fit["x"].strength > fit["y"].strength > fit["z"].strength > 0
    assert abs(sum(r.strength for r in fit.values()) - 1.0) < 1e-4


def test_bradley_terry_matches_closed_form_two_items(spark):
    """Two items: the MM fixpoint is p_x/p_y = wins_x/wins_y exactly;
    with 3:1 wins the normalized strengths are 0.75/0.25."""
    games = [(i, "x", "y", "a") for i in range(3)] + [(9, "x", "y", "b")]
    m = pairwise_matrix(_cmp(spark, games), "a", "b", "winner")
    fit = {r.item: r.strength for r in bradley_terry(m, n_iters=8).collect()}
    assert math.isclose(fit["x"], 0.75, abs_tol=1e-6)
    assert math.isclose(fit["y"], 0.25, abs_tol=1e-6)


def test_annotator_agreement_kappa_known_value(spark):
    """Hand-computed 2x2 case: 10 pairs, 7 agreements, marginals
    a: 6 'a' / b: 5 'a' -> pe = 0.3 + 0.2 = 0.5, kappa = 0.4."""
    la, lb = [], []
    labels = [
        ("a", "a"), ("a", "a"), ("a", "a"),        # 3 agree on 'a'
        ("b", "b"), ("b", "b"), ("b", "b"), ("b", "b"),  # 4 agree on 'b'
        ("a", "b"), ("a", "b"), ("a", "b"),        # 3 disagree
    ]
    for i, (x, y) in enumerate(labels):
        la.append((i, x))
        lb.append((i, y))
    A = spark.createDataFrame(la, "pair long, label string")
    B = spark.createDataFrame(lb, "pair long, label string")
    r = annotator_agreement(A, B, "pair", "label").collect()[0]
    assert r.n_pairs == 10 and r.n_agree == 7
    assert math.isclose(r.agreement, 0.7, abs_tol=1e-9)
    # pa = 0.6, pb = 0.3 -> pe = 0.18 + 0.28 = 0.46; kappa = 0.24/0.54
    assert math.isclose(r.kappa, round(0.24 / 0.54, 6), abs_tol=1e-9)


def test_annotator_agreement_constant_labels_null_kappa(spark):
    A = spark.createDataFrame([(1, "a"), (2, "a")], "pair long, label string")
    r = annotator_agreement(A, A, "pair", "label").collect()[0]
    assert r.agreement == 1.0 and r.kappa is None
