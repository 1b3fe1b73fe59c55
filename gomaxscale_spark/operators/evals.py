"""Eval-suite analysis: the statistics behind model-evaluation tables.

An eval run is per-problem trial counts — (problem, n_samples,
n_correct) — and its standard readouts are pass@k (the unbiased
combinatorial estimator of Chen et al. 2021, "Evaluating Large
Language Models Trained on Code", §2.1: 1 − C(n−c, k)/C(n, k)),
the suite-level mean pass@k curve, and per-problem confidence
intervals on the success rate (Wilson score — the interval that
behaves at small n and extreme rates, unlike the normal
approximation).

Exactness discipline: pass@k is computed as the fixed-order product
``1 − Π_{i=0..k−1} (n−c−i)/(n−i)`` — mathematically identical to the
binomial-ratio form but overflow-free at any n, and because it is
ROW-LOCAL arithmetic with a literal association order, the oracle
replays the exact same FP operation sequence (no group-sum
reordering anywhere near the value) — bit-equal across engines
before the output rounding even matters. The ``n − c < k`` branch is
exactly 1.0 (every size-k draw contains a success).

Scale: one partial-aggregable hash agg collapses the trials stream
to per-problem counts; every statistic after that is a pure map over
|problems| rows. The summary is a ≤|ks|-row re-agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: z for the 95% Wilson interval — plan literal, shared with oracles.
WILSON_Z = 1.96


def pass_at_k(counts: DataFrame, problem_col: str, ks=(1, 5, 10)) -> DataFrame:
    """Per-problem pass@k table from a (problem, n_samples, n_correct)
    counts frame: one row per (problem, k ∈ ks) with k ≤ n_samples —
    (problem, n_samples, n_correct, k, pass_at_k 6dp).

    Scale: a pure row-local map fanning each problem row out to
    ≤|ks| rows — zero exchanges beyond whatever produced the counts.
    """
    n = F.col("n_samples")
    c = F.col("n_correct")
    arms = []
    for k in ks:
        k = int(k)
        prod: Column = F.lit(1.0)
        for i in range(k):
            prod = prod * (
                (n - c - F.lit(i)).cast("double")
                / (n - F.lit(i)).cast("double")
            )
        val = F.when(n - c < k, F.lit(1.0)).otherwise(
            F.round(F.lit(1.0) - prod, 6)
        )
        arms.append(
            F.struct(
                F.lit(k).cast("long").alias("k"), val.alias("pass_at_k")
            )
        )
    ex = counts.select(
        F.col(problem_col),
        n.cast("long").alias("n_samples"),
        c.cast("long").alias("n_correct"),
        F.explode(F.array(*arms)).alias("a"),
    )
    return ex.filter(F.col("a.k") <= F.col("n_samples")).select(
        problem_col,
        "n_samples",
        "n_correct",
        F.col("a.k").alias("k"),
        F.col("a.pass_at_k").alias("pass_at_k"),
    )


def pass_at_k_summary(per_problem: DataFrame) -> DataFrame:
    """Suite-level pass@k curve from the ``pass_at_k`` table: per k —
    (k, n_problems, mean_pass_at_k, n_solved) with n_solved the
    problems whose estimator is exactly 1.0 at that k. Means are
    6dp-rounded (|problems| summands leave ~1e-13 engine noise —
    measure-zero at 6dp).

    Scale: one partial-aggregable agg over the (already bounded)
    per-problem table — ≤|ks| output rows.
    """
    return (
        per_problem.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_problems"),
            F.round(F.avg("pass_at_k"), 6).alias("mean_pass_at_k"),
            F.sum((F.col("pass_at_k") == 1.0).cast("long")).alias("n_solved"),
        )
    )


def wilson_interval(
    counts: DataFrame, problem_col: str, z: float = WILSON_Z
) -> DataFrame:
    """Per-problem Wilson 95% score interval on the success rate:
    (problem, n_samples, n_correct, rate, ci_lo, ci_hi), all ratios
    6dp-rounded. Row-local closed form with a mirrored association
    order in the oracle:

        center = (p + z²/2n) / (1 + z²/n)
        half   = z·sqrt(p(1−p)/n + z²/(4n²)) / (1 + z²/n)

    Scale: a pure map over the per-problem counts — zero exchanges.
    """
    zz = float(z) * float(z)
    n = F.col("n_samples").cast("double")
    p = F.col("n_correct").cast("double") / n
    denom = F.lit(1.0) + F.lit(zz) / n
    center = (p + F.lit(zz) / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + F.lit(zz) / (F.lit(4.0) * n * n)
        )
    ) / denom
    return counts.select(
        F.col(problem_col),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("n_correct").cast("long").alias("n_correct"),
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )
