"""RL-rollout processing + deterministic loader + temperature shares
(r16 wave 5): hand-computed GAE/returns semantics against a pure-Python
reference recurrence, loader order determinism / coverage / resume
consistency, and the exact-integer temperature-share arithmetic.
"""

from __future__ import annotations

import math

import pytest

from gomaxscale_spark.operators.rollout import (
    MAX_HORIZON,
    episode_card,
    gae_advantages,
    returns_to_go,
    td_residuals,
)
from gomaxscale_spark.operators.sampling import (
    loader_epoch_order,
    loader_resume_slice,
    temperature_shares,
)

SCHEMA = "ep long, step_key long, reward double, v double"


def _steps(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ref_gae(rewards, values, gamma, lam, horizon):
    """Pure-Python truncated GAE via the definition (the literal
    linear combination, same association order as the operator)."""
    n = len(rewards)
    deltas = [
        rewards[t]
        + gamma * (values[t + 1] if t + 1 < n else 0.0)
        - values[t]
        for t in range(n)
    ]
    out = []
    w = gamma * lam
    for t in range(n):
        acc = deltas[t]
        for l in range(1, horizon):
            acc = acc + (w ** l) * (deltas[t + l] if t + l < n else 0.0)
        out.append(acc)
    return deltas, out


def test_gae_matches_python_reference(spark):
    rewards = [1.0, -2.0, 3.5, 0.25, 4.0]
    values = [0.5, 1.0, -1.5, 2.0, 0.75]
    rows = [(1, i, rewards[i], values[i]) for i in range(5)]
    got = (
        gae_advantages(
            _steps(spark, rows),
            "ep",
            ["step_key"],
            "reward",
            "v",
            gamma=0.9,
            lam=0.8,
            horizon=3,
        )
        .orderBy("step_key")
        .collect()
    )
    deltas, advs = _ref_gae(rewards, values, 0.9, 0.8, 3)
    for r, d, a, v in zip(got, deltas, advs, values):
        assert r.delta == pytest.approx(round(d, 6), abs=1e-9)
        assert r.advantage == pytest.approx(round(a, 6), abs=1e-9)
        assert r.value_target == pytest.approx(
            round(round(a, 6) + v, 6), abs=1e-9
        )
    assert [r.step for r in got] == [1, 2, 3, 4, 5]


def test_gae_terminal_value_is_zero(spark):
    # single-step episode: delta = r - V (V_{T+1} := 0), advantage = delta
    got = gae_advantages(
        _steps(spark, [(7, 1, 2.0, 0.5)]),
        "ep",
        ["step_key"],
        "reward",
        "v",
        gamma=0.99,
        lam=0.95,
        horizon=8,
    ).collect()
    assert len(got) == 1
    assert got[0].delta == pytest.approx(1.5)
    assert got[0].advantage == pytest.approx(1.5)


def test_gae_episodes_do_not_leak(spark):
    # two episodes: the lead() terms must stop at the episode boundary,
    # so episode 1's advantages are identical with/without episode 2
    rows1 = [(1, 1, 1.0, 0.0), (1, 2, 2.0, 0.0)]
    rows2 = rows1 + [(2, 1, 100.0, 50.0), (2, 2, -100.0, 0.0)]
    kw = dict(gamma=0.9, lam=1.0, horizon=4)
    a1 = {
        r.step_key: r.advantage
        for r in gae_advantages(
            _steps(spark, rows1), "ep", ["step_key"], "reward", "v", **kw
        ).collect()
    }
    a2 = {
        r.step_key: r.advantage
        for r in gae_advantages(
            _steps(spark, rows2), "ep", ["step_key"], "reward", "v", **kw
        )
        .where("ep = 1")
        .collect()
    }
    assert a1 == a2


def test_returns_to_go_definition_and_horizon(spark):
    rewards = [1.0, 2.0, 4.0, 8.0]
    rows = [(1, i, rewards[i], 0.0) for i in range(4)]
    got = (
        returns_to_go(
            _steps(spark, rows),
            "ep",
            ["step_key"],
            "reward",
            gamma=0.5,
            horizon=2,
        )
        .orderBy("step_key")
        .collect()
    )
    # H=2: R_t = r_t + 0.5*r_{t+1}
    assert [r.return_to_go for r in got] == [2.0, 4.0, 8.0, 8.0]
    # H >= episode length reduces to the full discounted sum
    full = (
        returns_to_go(
            _steps(spark, rows),
            "ep",
            ["step_key"],
            "reward",
            gamma=0.5,
            horizon=8,
        )
        .orderBy("step_key")
        .collect()
    )
    expect = [
        sum(0.5 ** l * rewards[t + l] for l in range(len(rewards) - t))
        for t in range(4)
    ]
    for r, e in zip(full, expect):
        assert r.return_to_go == pytest.approx(round(e, 6), abs=1e-9)


def test_gae_lam1_equals_returns_when_values_zero(spark):
    rows = [(1, i, float(i + 1), 0.0) for i in range(6)]
    adv = (
        gae_advantages(
            _steps(spark, rows),
            "ep",
            ["step_key"],
            "reward",
            "v",
            gamma=0.7,
            lam=1.0,
            horizon=5,
        )
        .orderBy("step_key")
        .collect()
    )
    ret = (
        returns_to_go(
            _steps(spark, rows),
            "ep",
            ["step_key"],
            "reward",
            gamma=0.7,
            horizon=5,
        )
        .orderBy("step_key")
        .collect()
    )
    for a, r in zip(adv, ret):
        assert a.advantage == pytest.approx(r.return_to_go, abs=1e-9)


def test_horizon_bounds():
    from gomaxscale_spark.operators.rollout import _check_horizon

    with pytest.raises(ValueError, match="horizon"):
        _check_horizon(0)
    with pytest.raises(ValueError, match="horizon"):
        _check_horizon(MAX_HORIZON + 1)
    _check_horizon(1)
    _check_horizon(MAX_HORIZON)


def test_episode_card_hand_computed(spark):
    rows = [
        (1, 10, 2.25, 0.0),
        (1, 30, -1.0, 0.0),
        (1, 20, 0.5, 0.0),
        (2, 5, 7.0, 0.0),
    ]
    got = {
        r.ep: r
        for r in episode_card(
            _steps(spark, rows), "ep", ["step_key"], "reward"
        ).collect()
    }
    e1 = got[1]
    assert e1.n_steps == 3
    assert e1.total_reward == pytest.approx(1.75)
    assert e1.mean_reward == pytest.approx(round(1.75 / 3, 6))
    assert (e1.max_reward, e1.min_reward) == (2.25, -1.0)
    assert (e1.first_order_key, e1.last_order_key, e1.span) == (10, 30, 20)
    e2 = got[2]
    assert (e2.n_steps, e2.span) == (1, 0)


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_loader_order_deterministic_and_covering(spark):
    d = _ids(spark, 97)
    a = loader_epoch_order(d, "doc_id", 4, 42, 0).collect()
    b = loader_epoch_order(d, "doc_id", 4, 42, 0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a permutation: positions are exactly 1..N, every id appears once
    assert sorted(r.position for r in a) == list(range(1, 98))
    assert sorted(r.doc_id for r in a) == list(range(97))
    # shards partition the ids and ranks are 1..|shard|
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.rank_in_shard)
    assert 1 <= len(by_shard) <= 4
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_loader_round_robin_property(spark):
    # while no shard is exhausted, consecutive positions cycle shards:
    # the first |shards-with-rank-1| positions are all rank 1
    a = loader_epoch_order(_ids(spark, 80), "doc_id", 8, 1, 0).collect()
    first_round = sorted(r.shard for r in a if r.rank_in_shard == 1)
    by_pos = {r.position: r for r in a}
    head = [by_pos[p] for p in range(1, len(first_round) + 1)]
    assert sorted(r.shard for r in head) == first_round
    assert all(r.rank_in_shard == 1 for r in head)


def test_loader_epoch_reshuffles(spark):
    d = _ids(spark, 64)
    e0 = {r.doc_id: r.position for r in loader_epoch_order(d, "doc_id", 4, 42, 0).collect()}
    e1 = {r.doc_id: r.position for r in loader_epoch_order(d, "doc_id", 4, 42, 1).collect()}
    assert e0 != e1  # re-keying the hash produces a different order
    assert sorted(e1.values()) == list(range(1, 65))  # still a permutation


def test_loader_resume_is_a_slice_of_the_epoch(spark):
    d = _ids(spark, 60)
    full = {
        r.position: (r.doc_id, r.shard, r.rank_in_shard)
        for r in loader_epoch_order(d, "doc_id", 4, 7, 0).collect()
    }
    sl = loader_resume_slice(d, "doc_id", 4, 7, 0, offset=20, limit=10).collect()
    assert sorted(r.position for r in sl) == list(range(21, 31))
    for r in sl:
        assert full[r.position] == (r.doc_id, r.shard, r.rank_in_shard)


def test_loader_argument_validation(spark):
    d = _ids(spark, 4)
    with pytest.raises(ValueError, match="n_shards"):
        loader_epoch_order(d, "doc_id", 0, 1, 0)
    with pytest.raises(ValueError, match="offset"):
        loader_resume_slice(d, "doc_id", 2, 1, 0, offset=-1, limit=5)
    with pytest.raises(ValueError, match="offset"):
        loader_resume_slice(d, "doc_id", 2, 1, 0, offset=0, limit=0)


def test_temperature_shares_hand_computed(spark):
    rows = [("a",)] * 3 + [("b",)] * 1
    d = spark.createDataFrame(rows, "src string")
    got = {r.src: r for r in temperature_shares(d, "src").collect()}
    # proportional: 3/4, 1/4; tau=1/2 (p ∝ n²): 9/10, 1/10
    assert got["a"].share_proportional == pytest.approx(0.75)
    assert got["b"].share_proportional == pytest.approx(0.25)
    assert got["a"].share_tau_half == pytest.approx(0.9)
    assert got["b"].share_tau_half == pytest.approx(0.1)
    assert got["a"].boost == pytest.approx(1.2)  # 0.9/0.75
    assert got["b"].boost == pytest.approx(0.4)  # 0.1/0.25
    assert got["a"].n_docs == 3


def test_temperature_shares_sharpen_toward_head(spark):
    # the tau=0.5 mix concentrates on the head source and the shares
    # columns each sum to ~1
    rows = [("big",)] * 10 + [("small",)] * 2
    d = spark.createDataFrame(rows, "src string")
    got = {r.src: r for r in temperature_shares(d, "src").collect()}
    assert got["big"].share_tau_half > got["big"].share_proportional
    assert got["small"].share_tau_half < got["small"].share_proportional
    for col in ("share_proportional", "share_tau_half"):
        assert sum(getattr(r, col) for r in got.values()) == pytest.approx(
            1.0, abs=1e-5
        )


def test_training_batch_gates_and_enriches(spark):
    from gomaxscale_spark.operators.rollout import training_batch

    rows = [
        # episode 1: 3 steps, mean 2.0 — eligible at (2, 1.5)
        (1, 1, 1.0, 0.0), (1, 2, 2.0, 0.0), (1, 3, 3.0, 0.0),
        # episode 2: 1 step — fails min_steps
        (2, 1, 9.0, 0.0),
        # episode 3: 2 steps, mean 1.0 — fails min_mean_reward
        (3, 1, 1.0, 0.0), (3, 2, 1.0, 0.0),
    ]
    got = training_batch(
        _steps(spark, rows),
        "ep",
        ["step_key"],
        "reward",
        "v",
        gamma=1.0,
        lam=1.0,
        horizon=2,
        min_steps=2,
        min_mean_reward=1.5,
    ).collect()
    assert {r.ep for r in got} == {1}
    assert len(got) == 3  # every surviving step, enriched
    by_step = {r.step_key: r for r in got}
    # provenance columns ride along
    assert by_step[1].n_steps == 3
    assert by_step[1].total_reward == pytest.approx(6.0)
    assert by_step[1].mean_reward == pytest.approx(2.0)
    # advantages are the plain H=2 sums (V == 0, gamma*lam == 1)
    assert by_step[1].advantage == pytest.approx(3.0)  # 1 + 2
    assert by_step[3].advantage == pytest.approx(3.0)  # terminal: just r


def test_training_batch_no_mean_gate(spark):
    from gomaxscale_spark.operators.rollout import training_batch

    rows = [(1, 1, 1.0, 0.0), (1, 2, 1.0, 0.0), (2, 1, 5.0, 0.0)]
    got = training_batch(
        _steps(spark, rows),
        "ep",
        ["step_key"],
        "reward",
        "v",
        min_steps=2,
        min_mean_reward=None,
    ).collect()
    assert {r.ep for r in got} == {1}
