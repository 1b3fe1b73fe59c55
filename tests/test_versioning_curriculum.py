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
