"""RL rollout processing: advantages, returns, episode cards.

Post-training (RLHF / RL fine-tuning) produces rollout logs — per-step
(episode, step, reward, value-estimate) records — that the data
pipeline must turn into training targets: TD residuals, truncated GAE
advantages (Schulman et al. 2015, "High-Dimensional Continuous Control
Using Generalized Advantage Estimation"), discounted returns-to-go,
and per-episode QA cards. At 100 TB-of-rollouts scale the classic
formulation is a per-episode BACKWARD RECURRENCE
(``A_t = delta_t + (gamma*lam) * A_{t+1}``) — an inherently sequential
scan that would force a per-episode Python loop. These operators
re-express it declaratively: the practitioner-standard TRUNCATED form
(horizon H) is a closed linear combination of the next H TD residuals,

    A_t = sum_{l=0}^{H-1} (gamma*lam)^l * delta_{t+l},

so the whole computation is ONE episode-keyed window pass with H
``lead()`` terms — the coefficients are Python-computed double
literals baked into the plan, there is no recurrence, no UDF, and no
state. Every float expression is a FIXED, left-associated expression
tree that an oracle can mirror literally, so both engines produce
bit-equal doubles before output rounding (the association-order
discipline of the curriculum/BPE families).

Reference scope note: the reference consumer (gomaxscale.go) has no
analytics surface; this module is part of the mandated LLM-pipeline
extension (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: Plan-literal bound on the truncation horizon: each extra step adds a
#: ``lead()`` term to the projection, so H is plan size, not data size.
MAX_HORIZON = 64


def _check_horizon(horizon: int) -> None:
    if not (1 <= horizon <= MAX_HORIZON):
        raise ValueError(
            f"horizon must be in [1, {MAX_HORIZON}] (each step is a "
            f"plan-literal lead() term), got {horizon}"
        )


def td_residuals(
    steps: DataFrame,
    episode_col: str,
    order_cols: list[str],
    reward_col: str,
    value_col: str,
    gamma: float,
) -> DataFrame:
    """Append ``step`` (1-based position in the episode) and ``delta``
    (the TD(0) residual ``r_t + gamma*V_{t+1} - V_t``, with V := 0
    past the terminal step) to each rollout step.

    Scale: ONE episode-keyed exchange serves the row_number and the
    lead — same window partitioning, no second shuffle.
    """
    w = W.partitionBy(episode_col).orderBy(*order_cols)
    v_next = F.lead(F.col(value_col), 1, 0.0).over(w)
    # fixed association: (r + g*v_next) - v  — mirrored by the oracle
    delta = (
        F.col(reward_col) + F.lit(float(gamma)) * v_next
    ) - F.col(value_col)
    return steps.withColumn(
        "step", F.row_number().over(w).cast("long")
    ).withColumn("delta", delta)


def _truncated_geo_sum(
    term_col: str, w: W, coef: float, horizon: int
) -> Column:
    """``sum_{l=0}^{H-1} coef^l * lead(term, l)`` as a left-associated
    literal expression tree. Missing leads (past episode end) are 0 —
    exactly the truncated-GAE convention. Coefficients are computed in
    Python and embedded as double literals, so the Spark plan and the
    oracle SQL evaluate the SAME IEEE expression on the same doubles.
    """
    acc: Column = F.col(term_col)
    for l in range(1, horizon):
        acc = acc + F.lit(float(coef) ** l) * F.lead(
            F.col(term_col), l, 0.0
        ).over(w)
    return acc


def gae_advantages(
    steps: DataFrame,
    episode_col: str,
    order_cols: list[str],
    reward_col: str,
    value_col: str,
    gamma: float = 0.99,
    lam: float = 0.95,
    horizon: int = 8,
) -> DataFrame:
    """Truncated Generalized Advantage Estimation per rollout step:
    ``A_t = sum_{l=0}^{H-1} (gamma*lam)^l delta_{t+l}`` over the TD
    residuals, plus the value target ``A_t + V_t``.

    Scale: the backward recurrence is gone — one episode-keyed window
    exchange, H plan-literal lead() terms, zero Python in the hot
    path. H bounds PLAN size (MAX_HORIZON=64); episode length is
    unbounded data. Output is rollout-sized by design (it IS the
    training target); outputs are rounded at 6dp on bit-equal inputs.
    """
    _check_horizon(horizon)
    w = W.partitionBy(episode_col).orderBy(*order_cols)
    d = td_residuals(
        steps, episode_col, order_cols, reward_col, value_col, gamma
    )
    adv = _truncated_geo_sum("delta", w, float(gamma) * float(lam), horizon)
    # value_target adds the ALREADY-6dp-ROUNDED advantage to the
    # (few-decimal) value estimate: the true decimal value is then
    # exact at 6dp, so the outer round can never hit a digit-7 tie —
    # rounding the raw sum instead hit a genuine x.xxxxxx5 tie at
    # sf0.01 where Spark's repr-based and DuckDB's scaled-multiply
    # round() disagree (the money-sum rounding discipline).
    return d.select(
        F.col(episode_col),
        *[F.col(c) for c in order_cols],
        F.col("step"),
        F.round(F.col("delta"), 6).alias("delta"),
        F.round(adv, 6).alias("advantage"),
        F.round(F.round(adv, 6) + F.col(value_col), 6).alias(
            "value_target"
        ),
    )


def returns_to_go(
    steps: DataFrame,
    episode_col: str,
    order_cols: list[str],
    reward_col: str,
    gamma: float = 0.99,
    horizon: int = 8,
) -> DataFrame:
    """Truncated discounted return-to-go per step:
    ``R_t = sum_{l=0}^{H-1} gamma^l r_{t+l}`` — the reward-to-go
    target of decision-transformer / return-conditioned training, in
    the same one-window-pass shape as :func:`gae_advantages` (GAE with
    lam=1 and V==0 reduces to exactly this).
    """
    _check_horizon(horizon)
    w = W.partitionBy(episode_col).orderBy(*order_cols)
    ret = _truncated_geo_sum(reward_col, w, float(gamma), horizon)
    return steps.select(
        F.col(episode_col),
        *[F.col(c) for c in order_cols],
        F.row_number().over(w).cast("long").alias("step"),
        F.round(ret, 6).alias("return_to_go"),
    )


def episode_card(
    steps: DataFrame,
    episode_col: str,
    order_cols: list[str],
    reward_col: str,
) -> DataFrame:
    """Per-episode QA card: length, reward mass, reward extremes, and
    span — the triage table that decides which rollouts enter the
    training mix (degenerate 1-step episodes, reward-hacking outliers,
    truncated episodes all show up here first).

    Float discipline: ``total_reward`` is rounded at the money grain
    (the fixture rewards are 2-decimal) so the cross-engine sum
    association cannot flip it, and ``mean_reward`` divides the
    ROUNDED total — both engines derive it from the identical double.
    Scale: one partial-aggregable episode-keyed agg; the first/last
    span rides the same exchange via min/max on the order key.
    """
    first_order = F.min(order_cols[0])
    last_order = F.max(order_cols[0])
    total = F.round(F.sum(reward_col), 2)
    return steps.groupBy(episode_col).agg(
        F.count(F.lit(1)).alias("n_steps"),
        total.alias("total_reward"),
        F.round(
            total / F.count(F.lit(1)), 6
        ).alias("mean_reward"),
        F.max(reward_col).alias("max_reward"),
        F.min(reward_col).alias("min_reward"),
        first_order.alias("first_order_key"),
        last_order.alias("last_order_key"),
        (last_order - first_order).alias("span"),
    )


def training_batch(
    steps: DataFrame,
    episode_col: str,
    order_cols: list[str],
    reward_col: str,
    value_col: str,
    gamma: float = 0.99,
    lam: float = 0.95,
    horizon: int = 8,
    min_steps: int = 2,
    min_mean_reward: float | None = None,
) -> DataFrame:
    """The rollout-curation capstone: episode-QA-gated advantage
    targets — :func:`episode_card` decides which episodes are
    trainable (length and mean-reward gates: drops 1-step degenerates
    and reward-starved rollouts), :func:`gae_advantages` computes the
    targets for the SURVIVORS only, and the card's provenance columns
    ride along on every step (the manifest a PPO data loader reads).

    Scale — the composition discipline: the QA gate prunes EPISODES
    before the H-lead advantage fold ever runs (the card is a
    partial-aggregable episode agg; the gate is a filter on its
    ≤|episodes|-row output), and both the GAE window and the
    card-enrichment join are keyed by the SAME episode column, so the
    rollout-sized side is exchanged ONCE and reused — card build,
    filter, fold, and join all ride one partitioning (pinned by
    test_rollout_training_batch_single_exchange... in
    tests/test_plan_shapes.py).
    """
    card = episode_card(steps, episode_col, order_cols, reward_col)
    gate = F.col("n_steps") >= int(min_steps)
    if min_mean_reward is not None:
        gate = gate & (F.col("mean_reward") >= float(min_mean_reward))
    eligible = card.where(gate).select(
        episode_col, "n_steps", "total_reward", "mean_reward"
    )
    adv = gae_advantages(
        steps,
        episode_col,
        order_cols,
        reward_col,
        value_col,
        gamma=gamma,
        lam=lam,
        horizon=horizon,
    )
    return adv.join(eligible, on=episode_col, how="inner")
