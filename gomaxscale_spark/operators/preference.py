"""Preference-data QA: the operators behind RLHF / reward-model data
curation.

A preference dataset is pairwise comparisons — (item_a, item_b,
winner) rows, where items are model variants, prompt sources, or
annotator policies — and its QA surface is standard: the aggregated
WIN MATRIX (who beat whom, how often), the fitted per-item STRENGTHS
(Bradley-Terry via the Hunter 2004 minorize-maximize iteration — the
canonical preference-strength model behind most RLHF reward-data
audits and chat leaderboards), and ANNOTATOR AGREEMENT (raw rate +
Cohen's kappa) between labeling policies.

Scale discipline: the comparisons stream is corpus-sized but
collapses to a ≤|items|² matrix in ONE partial-aggregable hash agg —
everything downstream (the MM iterations, ranks, agreement) runs on
bounded frames. The BT fixpoint is the repo's unrolled-fixpoint shape
(graph_pagerank_dedup): K rounds of joins over the tiny matrix frame,
no driver-side loop over data, strengths 6dp-rounded only at the
output (the cosine-leg discipline for cross-engine float parity).

Reference scope note: the reference consumer (gomaxscale.go) has no
analytics surface; this module is part of the mandated LLM-pipeline
extension (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pairwise_matrix(
    comparisons: DataFrame,
    item_a_col: str,
    item_b_col: str,
    winner_col: str,
) -> DataFrame:
    """Canonical win matrix from a comparisons stream: one row per
    unordered item pair — (item_a < item_b, wins_a, wins_b, n_games).
    ``winner_col`` holds 'a' or 'b' relative to the INPUT columns;
    rows comparing an item to itself are dropped (they carry no
    preference signal and break the BT fit).

    Scale: pair canonicalization is a pure map; the count is ONE
    hash agg collapsing the corpus-sized stream to ≤|items|² rows,
    partials folding map-side.
    """
    a, b, w = F.col(item_a_col), F.col(item_b_col), F.col(winner_col)
    lo = F.least(a, b)
    hi = F.greatest(a, b)
    # did the LOW item win? (winner is relative to input column order)
    lo_won = F.when(a < b, w == "a").otherwise(w == "b")
    return (
        comparisons.filter(a != b)
        .select(
            lo.alias("item_a"),
            hi.alias("item_b"),
            lo_won.cast("long").alias("__lo_won"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("__lo_won").cast("long").alias("wins_a"),
            (F.count(F.lit(1)) - F.sum("__lo_won"))
            .cast("long")
            .alias("wins_b"),
            F.count(F.lit(1)).cast("long").alias("n_games"),
        )
    )


def bradley_terry(
    matrix: DataFrame, n_iters: int = 8, round_dp: int = 6
) -> DataFrame:
    """Bradley-Terry strengths from a canonical win matrix
    (``pairwise_matrix`` output) via ``n_iters`` unrolled
    minorize-maximize rounds (Hunter 2004):

        p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j),   then Σ p = 1

    Returns (item, strength, rank) — strength ``round_dp``-rounded at
    the OUTPUT only, rank dense by strength desc with item tie-break.
    Items with zero wins converge toward 0 (the MM update keeps them
    positive; uniform init).

    Scale: the matrix is ≤|items|² rows by construction, so each round
    is a join + agg over bounded frames — the unrolled-fixpoint
    discipline of graph_pagerank_dedup; nothing here ever touches the
    corpus-sized comparisons stream again. Each round's state is
    MATERIALIZED (operators/materialize.py): the update references p
    three times (both join sides + the normalizer), so a lazy chain
    would grow the logical plan ~3^K-fold — the documented
    deep-fixpoint failure mode; truncating per round keeps the plan
    O(1) deep. Float parity: group sums over ≤|items| terms leave
    ~1e-15 engine noise after K rounds — measure-zero at 6dp (the
    cosine-leg contract), and ranks sort the ROUNDED strength.
    """
    from pyspark.sql import Window as W

    from .materialize import materialize_once

    # materialize the MATRIX itself first (r16 optimization round,
    # guide §2.4/§5): edges and wins each consumed it, so the
    # corpus-collapsing comparisons aggregation behind it executed
    # twice; off one materialized frame both derivations are
    # matrix-bounded selects
    matrix = materialize_once(
        matrix.select("item_a", "item_b", "wins_a", "wins_b", "n_games")
    )
    edges = materialize_once(matrix.select(
        F.col("item_a").alias("i"),
        F.col("item_b").alias("j"),
        F.col("n_games").cast("double").alias("n"),
    ).union(
        matrix.select(
            F.col("item_b").alias("i"),
            F.col("item_a").alias("j"),
            F.col("n_games").cast("double").alias("n"),
        )
    ))
    wins = materialize_once(
        matrix.select(F.col("item_a").alias("i"), F.col("wins_a").alias("w"))
        .union(
            matrix.select(F.col("item_b").alias("i"), F.col("wins_b").alias("w"))
        )
        .groupBy("i")
        .agg(F.sum("w").cast("double").alias("W"))
    )
    items = edges.select("i").distinct()
    nn = items.agg(F.count(F.lit(1)).alias("k"))
    p = items.crossJoin(F.broadcast(nn)).select(
        "i", (F.lit(1.0) / F.col("k")).alias("p")
    )
    for _ in range(int(n_iters)):
        denom = (
            edges.join(p.withColumnRenamed("i", "__pi"), edges.i == F.col("__pi"))
            .drop("__pi")
            .withColumnRenamed("p", "p_i")
            .join(
                p.select(F.col("i").alias("j"), F.col("p").alias("p_j")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("n") / (F.col("p_i") + F.col("p_j"))).alias("d"))
        )
        up = wins.join(denom, "i").select(
            "i", (F.col("W") / F.col("d")).alias("u")
        )
        z = up.agg(F.sum("u").alias("z"))
        # per-round truncation, kept after an A/B (r16 optimization
        # round): checkpointing only every 2nd round halved the
        # barriers but REGRESSED 2.8 → 4.2 s at sf0.1 — the lazy
        # odd-round p loses its known (tiny) size estimate, so the
        # denom joins planned as exchanges instead of broadcasts; the
        # per-round materialized form keeps every MM join broadcast
        p = materialize_once(
            up.crossJoin(F.broadcast(z)).select(
                "i", (F.col("u") / F.col("z")).alias("p")
            )
        )
    # rank over the ROUNDED strength (item tie-break): engines agreeing
    # at round_dp then agree on ranks by construction — an unrounded
    # sort key would let last-ulp noise flip near-ties
    rounded = p.select(
        F.col("i").alias("item"),
        F.round("p", int(round_dp)).alias("strength"),
    )
    rank = F.row_number().over(
        W.orderBy(F.col("strength").desc(), F.col("item").asc())
    )
    return rounded.select("item", "strength", rank.cast("long").alias("rank"))


def annotator_agreement(
    labels_a: DataFrame,
    labels_b: DataFrame,
    pair_col: str,
    label_col: str,
) -> DataFrame:
    """Inter-annotator agreement between two labeling policies over
    the same comparison pairs: ONE row — (n_pairs, n_agree,
    agreement, kappa). ``kappa`` is Cohen's chance-corrected
    agreement, ``(p_o − p_e) / (1 − p_e)`` with ``p_e`` from each
    policy's label marginals (binary labels 'a'/'b'); ``1 − p_e = 0``
    (both annotators constant) yields NULL kappa.

    Scale: one pair-keyed join of two label streams + a 1-row
    conditional-sum agg — marginals ride the same agg as the
    agreement count; ratios 6dp-rounded at the output.
    """
    a = labels_a.select(
        F.col(pair_col).alias("__pair"), F.col(label_col).alias("la")
    )
    b = labels_b.select(
        F.col(pair_col).alias("__pair"), F.col(label_col).alias("lb")
    )
    j = a.join(b, "__pair")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).alias("n_agree"),
        F.sum((F.col("la") == "a").cast("long")).alias("__a_a"),
        F.sum((F.col("lb") == "a").cast("long")).alias("__b_a"),
    )
    n = F.col("n_pairs").cast("double")
    po = F.col("n_agree") / n
    pa = F.col("__a_a") / n
    pb = F.col("__b_a") / n
    pe = pa * pb + (F.lit(1.0) - pa) * (F.lit(1.0) - pb)
    kappa = F.when(
        pe != 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6)
    )
    return agg.select(
        "n_pairs",
        F.col("n_agree").cast("long").alias("n_agree"),
        F.round(po, 6).alias("agreement"),
        kappa.alias("kappa"),
    )
