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

import os

from pyspark.sql import Column, DataFrame, functions as F

#: Row-count cap under which the Bradley-Terry MM iteration runs as a
#: driver-side numpy loop instead of K unrolled join+agg rounds (r17
#: optimization round, guide §8 "decide with small rows" / §5 driver
#: discipline — the same runtime size decision as the r16
#: SPARK_GRAFT_CC_SMALL_EDGES union-find path). 2¹⁷ matrix rows ≈ a few
#: MB through Arrow — the size class a broadcast join's build side
#: collects to the driver anyway. Above the cap the distributed
#: unrolled-fixpoint loop is byte-identical to before.
BT_SMALL_MATRIX_ROWS = 1 << 17


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
    # r17 optimization round (guide §8 / §5): when the materialized
    # matrix is driver-small — a RUNTIME row-count decision, not a
    # data-size assumption — run the K MM rounds as one numpy loop on
    # the collected matrix instead of K join+agg rounds each paying a
    # checkpoint barrier over a tiny frame (measured: the distributed
    # loop's wall is ~12 sequential driver-synchronized jobs, not
    # compute). Identical arithmetic, identical update order; the
    # rounding/rank tail below is SHARED with the distributed path, so
    # output parity holds by construction up to float sum order
    # (measure-zero at round_dp — the same class as the DuckDB oracle's
    # own sum order, pinned by the forced both-paths equivalence test).
    cap = int(
        os.environ.get("SPARK_GRAFT_BT_SMALL_MATRIX", str(BT_SMALL_MATRIX_ROWS))
    )
    if cap > 0 and matrix.count() <= cap:
        p = _bt_mm_driver(matrix, int(n_iters))
    else:
        p = _bt_mm_distributed(matrix, int(n_iters))
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


def _bt_mm_driver(matrix: DataFrame, n_iters: int) -> DataFrame:
    """Driver-side numpy MM loop over a collected (driver-small) win
    matrix — returns the same (i, p) frame shape the distributed loop
    produces, so the caller's rounding/rank tail is shared. The
    arithmetic is the Hunter 2004 update verbatim: d_i = Σ n/(p_i+p_j)
    over both edge directions, u = W/d, p = u/Σu each round."""
    import numpy as np
    from pyspark.sql import types as T

    pdf = matrix.toPandas()
    items = sorted(set(pdf["item_a"]) | set(pdf["item_b"]))
    k = len(items)
    idx = {it: i for i, it in enumerate(items)}
    ia = pdf["item_a"].map(idx).to_numpy(dtype=np.int64)
    ib = pdf["item_b"].map(idx).to_numpy(dtype=np.int64)
    n = pdf["n_games"].to_numpy(dtype=np.float64)
    wv = np.zeros(k)
    np.add.at(wv, ia, pdf["wins_a"].to_numpy(dtype=np.float64))
    np.add.at(wv, ib, pdf["wins_b"].to_numpy(dtype=np.float64))
    p = np.full(k, 1.0 / k) if k else np.zeros(0)
    for _ in range(n_iters):
        if not k:
            break
        c = n / (p[ia] + p[ib])
        d = np.zeros(k)
        np.add.at(d, ia, c)
        np.add.at(d, ib, c)
        u = wv / d
        p = u / u.sum()
    schema = T.StructType(
        [
            T.StructField("i", matrix.schema["item_a"].dataType),
            T.StructField("p", T.DoubleType()),
        ]
    )
    return matrix.sparkSession.createDataFrame(
        [(it, float(p[idx[it]])) for it in items], schema
    )


def _bt_mm_distributed(matrix: DataFrame, n_iters: int) -> DataFrame:
    """The unrolled-fixpoint MM loop over bounded frames — the path for
    matrices above the driver cap (unchanged r16 shape)."""
    from .materialize import materialize_once

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
    return p


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
