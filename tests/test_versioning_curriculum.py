"""r15 families: corpus versioning (release diffing), tokenizer
application (BPE fertility curve), curriculum interleave ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.sampling import curriculum_interleave
from gomaxscale_spark.operators.text import bpe_fertility
from gomaxscale_spark.operators.versioning import (
    corpus_version_diff,
    release_delta_card,
)


# ------------------------------------------------- corpus versioning


def test_version_diff_classifies_every_arm(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "id long, text string"
    )
    rows = {r.id: r for r in corpus_version_diff(old, new, "id", "text").collect()}
    assert set(rows) == {1, 3, 4}  # 2 is unchanged -> filtered
    assert rows[1].change == "removed" and rows[1].new_digest is None
    assert rows[4].change == "added" and rows[4].old_digest is None
    assert rows[3].change == "changed"
    assert rows[3].old_digest != rows[3].new_digest


def test_version_diff_no_text_in_shuffle(spark, sf_dir):
    """The release-diff contract at 100 TB: the join shuffles digests,
    never the text column — the exchange input projects (id, md5)."""
    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 2 == 0)
    plan = corpus_version_diff(old, d, "doc_id", "text")._jdf.queryExecution(
    ).optimizedPlan().toString()
    # md5 is computed BELOW the join (in the per-side projections);
    # no raw `text` attribute survives into the join output
    assert "md5" in plan
    join_idx = plan.lower().index("join")
    assert "text#" not in plan[:join_idx]


def test_release_delta_card_sums_to_population(spark):
    old = spark.createDataFrame(
        [(1, "aa", "web"), (2, "bb", "web"), (3, "cc", "book")],
        "id long, text string, src string",
    )
    new = spark.createDataFrame(
        [(2, "bbb", "web"), (3, "cc", "book"), (4, "dddd", "web")],
        "id long, text string, src string",
    )
    rows = release_delta_card(old, new, "id", "text", "src").collect()
    by = {(r.src, r.change): r for r in rows}
    assert by[("web", "removed")].n_docs == 1
    assert by[("web", "removed")].char_delta == -2  # "aa" gone
    assert by[("web", "changed")].char_delta == 1  # bb -> bbb
    assert by[("web", "added")].char_delta == 4
    assert by[("book", "unchanged")].n_docs == 1
    assert by[("book", "unchanged")].char_delta == 0
    assert sum(r.n_docs for r in rows) == 4  # union of ids


# --------------------------------------------------- BPE fertility


def test_bpe_fertility_curve_properties(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = sorted(
        bpe_fertility(d, "text", n_merges=3).collect(),
        key=lambda r: r.n_merges,
    )
    assert [r.n_merges for r in rows] == [0, 1, 2, 3]
    # round 0 is raw characters
    assert rows[0].chars_per_token == 1.0
    # every merge strictly shrinks the token stream (each applied rule
    # had n_occurrences >= 1) and never below half
    toks = [r.total_tokens for r in rows]
    assert all(a > b for a, b in zip(toks, toks[1:]))
    assert all(r.chars_per_token >= 1.0 for r in rows)


# ------------------------------------------------ curriculum order


def test_curriculum_closed_form_equals_global_window(spark, sf_dir):
    """The scale formulation (closed-form position from per-stratum
    counts, no global window) must equal the naive global row_number
    — on the real table with uneven strata."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    got = curriculum_interleave(d, "doc_id", "source", "n_chars")
    rank = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("n_chars"), F.col("doc_id"))
    )
    naive = (
        d.select("doc_id", "source", rank.alias("rank_in_stratum"))
        .withColumn(
            "position",
            F.row_number()
            .over(W.orderBy(F.col("rank_in_stratum"), F.col("source")))
            .cast("long"),
        )
        .withColumn("rank_in_stratum", F.col("rank_in_stratum").cast("long"))
    )
    assert got.count() == d.count()
    assert (
        got.join(
            naive,
            ["doc_id", "source", "rank_in_stratum", "position"],
            "inner",
        ).count()
        == d.count()
    )


def test_curriculum_round_robin_and_easy_first(spark):
    d = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 5), (3, "a", 20),
            (4, "b", 7),
        ],
        "id long, src string, diff long",
    )
    rows = sorted(
        curriculum_interleave(d, "id", "src", "diff").collect(),
        key=lambda r: r.position,
    )
    # round 1: easiest of a (id 2), easiest of b (id 4);
    # rounds 2-3: remaining a's easy-to-hard
    assert [r.id for r in rows] == [2, 4, 1, 3]
    assert [r.position for r in rows] == [1, 2, 3, 4]


# ---------------------------------------------- manifest lake (r15)


def test_manifest_lake_batch_split_invariant(spark, sf_dir, tmp_path):
    """The lake's manifest union must be identical whatever batch
    split delivered the corpus — the invariant that makes the
    streaming version-diff oracle-checkable by the batch SQL."""
    from gomaxscale_spark.streaming.manifest_lake import ManifestLakeSink

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    one = ManifestLakeSink(str(tmp_path / "one"))
    one.apply_batch(d, 0)
    four = ManifestLakeSink(str(tmp_path / "four"))
    for i in range(4):
        four.apply_batch(d.filter(F.col("doc_id") % 4 == i), i)
    a = {(r["__id"], r["digest"]) for r in one.read_manifest(spark).collect()}
    b = {(r["__id"], r["digest"]) for r in four.read_manifest(spark).collect()}
    assert a == b and len(a) == d.count()


def test_manifest_lake_retried_epoch_is_noop_and_diff_serves(spark, tmp_path):
    from gomaxscale_spark.streaming.manifest_lake import ManifestLakeSink

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    newv = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    sink = ManifestLakeSink(str(tmp_path / "lake"))
    sink.apply_batch(newv.filter(F.col("doc_id") <= 3), 0)
    sink.apply_batch(newv.filter(F.col("doc_id") > 3), 1)
    # retried epoch: committed -> no-op (no duplicate rows)
    sink.apply_batch(newv.filter(F.col("doc_id") <= 3), 0)
    assert sink.read_manifest(spark).count() == 3
    rows = {r.doc_id: r.change for r in
            sink.diff_against(old, "doc_id", "text").collect()}
    assert rows == {1: "removed", 3: "changed", 4: "added"}
    # compact to one epoch; diff unchanged
    sink.compact(spark)
    rows2 = {r.doc_id: r.change for r in
             sink.diff_against(old, "doc_id", "text").collect()}
    assert rows2 == rows


def test_manifest_lake_empty_serves_all_removed(spark, tmp_path):
    from gomaxscale_spark.streaming.manifest_lake import ManifestLakeSink

    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    sink = ManifestLakeSink(str(tmp_path / "lake0"))
    rows = sink.diff_against(old, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0].change == "removed"


def test_bpe_fertility_by_source_consistent_with_corpus_curve(spark, sf_dir):
    """Per-source fertility under the global rules must aggregate back
    to the corpus curve's final round: Σ_source total_tokens equals
    the corpus total at the same merge count (the word-purity identity
    the operator is built on)."""
    from gomaxscale_spark.operators.text import bpe_fertility_by_source

    d = load_table(spark, sf_dir, "documents")
    per_src = bpe_fertility_by_source(d, "text", "source", n_merges=3).collect()
    corpus = {
        r.n_merges: r.total_tokens
        for r in bpe_fertility(d, "text", n_merges=3).collect()
    }
    assert sum(r.total_tokens for r in per_src) == corpus[3]
    assert all(r.tokens_per_word >= 1.0 for r in per_src)
    assert len(per_src) == d.select("source").distinct().count()


def test_release_gate_verdicts(spark):
    """A takedown-gone-wrong (most ids removed) must fail the removed
    row and pass the added row; fractions are of the union."""
    from gomaxscale_spark.operators.versioning import release_version_gate

    old = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 11)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 4)], "id long, text string"
    )
    rows = {r.check: r for r in
            release_version_gate(old, new, "id", "text").collect()}
    assert rows["removed"].n_docs == 7 and rows["removed"].frac == 0.7
    assert not rows["removed"].passed
    assert rows["added"].n_docs == 0 and rows["added"].passed
    assert rows["changed"].passed


def test_release_gate_single_pass_plan(spark):
    """r16 (VERDICT r15 item 5): the three check rows come from ONE
    explode over the single conditional-sum row — the plan must carry
    no Union (the old three-arm unionAll re-derived the digest join
    up to 3×) and exactly one Generate node."""
    from gomaxscale_spark.operators.versioning import release_version_gate

    old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string")
    new = spark.createDataFrame([(2, "b"), (3, "c")], "id long, text string")
    df = release_version_gate(old, new, "id", "text")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Generate") == 1
    rows = {r.check: r for r in df.collect()}
    assert set(rows) == {"added", "removed", "changed"}
    assert rows["added"].n_docs == 1 and rows["removed"].n_docs == 1


def test_curriculum_null_stratum_raises(spark):
    """r16 ADVICE: a NULL stratum has no place in the plan-literal
    total order — fail loudly instead of TypeError-ing in sorted()."""
    import pytest

    from gomaxscale_spark.operators.sampling import curriculum_interleave

    df = spark.createDataFrame(
        [(1, "web", 10), (2, None, 5)], "id long, src string, diff long"
    )
    with pytest.raises(ValueError, match="NULL stratum"):
        curriculum_interleave(df, "id", "src", "diff")


# --------------------------------- BPE early-fixpoint parity (r16 ADVICE)


def _degenerate_duck():
    """DuckDB connection over a corpus that supports exactly ONE merge
    (every word is 'ab'), so rounds 2..4 hit the fixed point."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'ab ab'), (2, 'ab')) AS t(doc_id, text)"
    )
    return con


def test_bpe_fertility_early_fixpoint_matches_oracle(spark):
    """A corpus supporting fewer merges than n_merges must still emit
    n_merges+1 curve rows (fixed-point padding), and the oracle's
    NOT EXISTS carry arm must replay them exactly."""
    from gomaxscale_spark.plans.llm import _bpe_fertility_oracle
    from gomaxscale_spark.testing import compare_frames

    d = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    engine = bpe_fertility(d, "text", n_merges=4).toPandas()
    con = _degenerate_duck()
    try:
        oracle = con.execute(_bpe_fertility_oracle(4)).df()
    finally:
        con.close()
    assert not compare_frames(engine, oracle)
    rows = sorted(
        engine.itertuples(index=False), key=lambda r: r.n_merges
    )
    assert [r.total_tokens for r in rows] == [6, 3, 3, 3, 3]


def test_bpe_merges_early_fixpoint_matches_oracle(spark):
    """Engine breaks after the last supported merge; the oracle's
    empty top{r} arms contribute no rows — both sides emit exactly
    the supported rounds."""
    from gomaxscale_spark.operators.text import bpe_merges
    from gomaxscale_spark.plans.llm import _bpe_merges_oracle
    from gomaxscale_spark.testing import compare_frames

    d = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    engine = bpe_merges(d, "text", n_merges=4).toPandas()
    con = _degenerate_duck()
    try:
        oracle = con.execute(_bpe_merges_oracle(4)).df()
    finally:
        con.close()
    assert not compare_frames(engine, oracle)
    assert len(engine) == 1  # only one merge is learnable


def test_bpe_fertility_empty_corpus_null_rows(spark):
    """An empty corpus yields n_merges+1 all-NULL stat rows (the
    oracle's empty-CTE NULL aggregates) instead of a TypeError."""
    d = spark.createDataFrame([], "doc_id long, text string")
    rows = bpe_fertility(d, "text", n_merges=2).collect()
    assert len(rows) == 3
    assert all(r.total_tokens is None for r in rows)


# ------------------------------- r16: tokenizer loop + release capstone


def test_bpe_encode_consistent_with_counts_and_fertility(spark, sf_dir):
    """The three tokenizer-application views must agree: per-doc
    |token_ids| == bpe_token_counts, and their total equals the
    fertility curve's final-round corpus total (the word-purity
    identity end to end)."""
    from gomaxscale_spark.operators.text import bpe_encode, bpe_token_counts

    d = load_table(spark, sf_dir, "documents")
    enc = {
        r[0]: r.n_tokens
        for r in bpe_encode(d, "doc_id", "text", n_merges=3).collect()
    }
    cnt = {
        r[0]: r.n_tokens
        for r in bpe_token_counts(d, "doc_id", "text", n_merges=3).collect()
    }
    # every doc with >= 1 word appears in both with equal counts
    assert enc == {k: v for k, v in cnt.items() if v > 0}
    corpus = {
        r.n_merges: r.total_tokens
        for r in bpe_fertility(d, "text", n_merges=3).collect()
    }
    assert sum(cnt.values()) == corpus[3]


def test_bpe_encode_token_ids_decode_back(spark):
    """Round-trip on a tiny corpus: decoding each doc's token-id
    sequence through the id->token table reproduces the doc's
    lowercased concatenated characters."""
    from gomaxscale_spark.operators.text import (
        _bpe_rounds,
        _bpe_vocab,
        bpe_encode,
        bpe_token_vocab,
    )

    d = spark.createDataFrame(
        [(1, "abab cd Abab"), (2, "cd cd ee")], "doc_id long, text string"
    )
    vocab = _bpe_vocab(d, "text")
    _, states = _bpe_rounds(vocab, 2, apply_last=True)
    id2tok = {
        r.token_id: r.tok for r in bpe_token_vocab(states[-1]).collect()
    }
    for s in states:
        s.unpersist()
    got = {
        r[0]: "".join(id2tok[i] for i in r.token_ids)
        for r in bpe_encode(d, "doc_id", "text", n_merges=2).collect()
    }
    assert got == {1: "ababcdabab", 2: "cdcdee"}


def test_release_pipeline_verdict_consistency(spark, sf_dir):
    """The capstone's verdict row must equal AND(gate rows) AND
    zero-flagged-decon, and the diff populations must sum to the
    union population implied by the gate fractions."""
    from gomaxscale_spark.plans import all_queries

    rows = all_queries()["corpus_release_pipeline"].fn(spark, sf_dir).collect()
    by = {(r.stage, r.item): r for r in rows}
    gate_ok = all(r.passed for r in rows if r.stage == "gate")
    decon = by[("decontamination", "delta_flagged")]
    verdict = by[("release", "verdict")]
    assert verdict.passed == (gate_ok and decon.n_docs == 0)
    diff_total = sum(r.n_docs for r in rows if r.stage == "diff")
    delta_total = sum(
        r.n_docs for r in rows if r.stage == "diff" and r.item != "unchanged"
    )
    assert verdict.n_docs == delta_total
    assert diff_total >= delta_total > 0
