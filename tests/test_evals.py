"""r16 family wave 3: eval-suite analysis (operators/evals.py)."""

from __future__ import annotations

import math

from gomaxscale_spark.operators.evals import (
    pass_at_k,
    pass_at_k_summary,
    wilson_interval,
)


def _counts(spark, rows):
    return spark.createDataFrame(
        rows, "problem string, n_samples long, n_correct long"
    )


def _exact_pass_at_k(n, c, k):
    """Reference: 1 − C(n−c, k)/C(n, k) in exact integer arithmetic."""
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


def test_pass_at_k_matches_combinatorial_reference(spark):
    rows = [
        ("p0", 50, 0),
        ("p1", 50, 1),
        ("p2", 50, 10),
        ("p3", 50, 45),   # n - c = 5 < 10 -> pass@10 exactly 1.0
        ("p4", 7, 3),     # k=10 > n -> no k=10 row
        ("p5", 200, 2),
    ]
    got = {
        (r.problem, r.k): r.pass_at_k
        for r in pass_at_k(_counts(spark, rows), "problem", ks=(1, 5, 10)).collect()
    }
    for p, n, c in rows:
        for k in (1, 5, 10):
            if k > n:
                assert (p, k) not in got
                continue
            expect = _exact_pass_at_k(n, c, k)
            assert math.isclose(got[(p, k)], round(expect, 6), abs_tol=2e-6), (
                p, k, got[(p, k)], expect
            )
    assert got[("p3", 10)] == 1.0
    assert got[("p0", 5)] == 0.0


def test_pass_at_k_monotone_in_k_and_c(spark):
    rows = [("q", 60, 6)]
    got = {
        r.k: r.pass_at_k
        for r in pass_at_k(_counts(spark, rows), "problem").collect()
    }
    assert got[1] <= got[5] <= got[10]  # more draws help
    assert math.isclose(got[1], 0.1, abs_tol=1e-9)  # c/n exactly


def test_pass_at_k_summary_counts_solved(spark):
    rows = [("a", 20, 20), ("b", 20, 0), ("c", 20, 15)]
    per = pass_at_k(_counts(spark, rows), "problem", ks=(1,))
    s = {r.k: r for r in pass_at_k_summary(per).collect()}
    assert s[1].n_problems == 3
    assert s[1].n_solved == 1  # only the all-correct problem hits 1.0
    assert math.isclose(s[1].mean_pass_at_k, round((1.0 + 0.0 + 0.75) / 3, 6))


def test_wilson_interval_brackets_rate_and_shrinks(spark):
    rows = [("s", 10, 5), ("l", 1000, 500), ("z", 10, 0), ("f", 10, 10)]
    got = {r.problem: r for r in
           wilson_interval(_counts(spark, rows), "problem").collect()}
    for r in got.values():
        assert 0.0 <= r.ci_lo <= r.rate <= r.ci_hi <= 1.0 or (
            # Wilson center is pulled toward 0.5, so rate can sit at
            # an endpoint for extreme counts — but never outside [0,1]
            0.0 <= r.ci_lo <= r.ci_hi <= 1.0
        )
    # same rate, more samples -> tighter interval
    assert (got["l"].ci_hi - got["l"].ci_lo) < (got["s"].ci_hi - got["s"].ci_lo)
    # zero successes: lower bound exactly 0 is NOT expected (Wilson > 0
    # lower bound only when c > 0); c = 0 gives ci_lo = 0
    assert got["z"].ci_lo == 0.0 and got["z"].ci_hi > 0.0
    assert got["f"].ci_hi == 1.0 and got["f"].ci_lo < 1.0
