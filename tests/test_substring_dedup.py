"""Exact-substring (duplicated-span) dedup semantics on hand-built
micro corpora — the positional dedup modality (Lee et al. 2021 shape):
window marking, token-granular span merging, canonical-occurrence
retention, and the short-doc guard. Oracle parity over the real corpus
is covered by the catalog replay (test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomaxscale_spark.operators import dedup as D

W = 4  # small window so micro docs are readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_positions_count_and_short_doc_guard(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e"),      # 5 tokens → 2 windows (pos 0, 1)
            (2, "a b c"),          # shorter than W → no rows
            (3, "a b c d"),        # exactly W → 1 window at pos 0
        ],
    )
    rows = D.substring_window_positions(df, "doc_id", "text", window=W).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert sorted(by_doc[1]) == [0, 1]
    assert 2 not in by_doc
    assert by_doc[3] == [0]


def test_same_window_content_gets_same_key_across_docs(spark):
    df = _docs(spark, [(1, "x y z w tail"), (2, "head x y z w")])
    rows = D.substring_window_positions(df, "doc_id", "text", window=W).collect()
    key = {(r["doc_id"], r["pos"]): r["wh"] for r in rows}
    # "x y z w" sits at pos 0 in doc 1 and pos 1 in doc 2
    assert key[(1, 0)] == key[(2, 1)]
    assert key[(1, 1)] != key[(1, 0)]


def test_coverage_marks_shared_span_tokens_only(spark):
    # docs 1/2 share the 5-token run "q r s t u" (two overlapping
    # 4-windows); doc 3 is clean. Token-granular coverage = 5 tokens.
    df = _docs(
        spark,
        [
            (1, "q r s t u aa bb cc"),
            (2, "dd ee q r s t u ff"),
            (3, "gg hh ii jj kk ll mm"),
        ],
    )
    cov = {
        r["doc_id"]: r
        for r in D.substring_duplicate_coverage(df, "doc_id", "text", window=W).collect()
    }
    assert len(cov) == 3  # clean docs still reported
    assert cov[1]["dup_tokens"] == 5 and cov[2]["dup_tokens"] == 5
    assert cov[3]["dup_tokens"] == 0 and cov[3]["dup_coverage"] == 0.0
    assert cov[1]["total_tokens"] == 8
    assert abs(cov[1]["dup_coverage"] - round(5 / 8, 6)) < 1e-12


def test_intra_document_repeat_is_duplicated(spark):
    # the same 4-gram twice WITHIN one doc counts (another position)
    df = _docs(spark, [(1, "p q r s zz p q r s"), (2, "unrelated words only here")])
    cov = {
        r["doc_id"]: r["dup_tokens"]
        for r in D.substring_duplicate_coverage(df, "doc_id", "text", window=W).collect()
    }
    assert cov[1] == 8  # both occurrences' tokens, not the separator
    assert cov[2] == 0


def test_strip_keeps_canonical_occurrence(spark):
    # exact duplicate docs: the min (doc, pos) copy survives intact,
    # the other collapses to empty
    df = _docs(spark, [(5, "m n o p q r"), (9, "m n o p q r")])
    st = {r["doc_id"]: r for r in D.substring_strip(df, "doc_id", "text", window=W).collect()}
    assert st[5]["kept_text"] == "m n o p q r"
    assert st[5]["n_removed"] == 0
    assert st[9]["kept_text"] == ""
    assert st[9]["n_kept"] == 0 and st[9]["n_removed"] == 6


def test_strip_partial_overlap_keeps_unique_context(spark):
    # doc 2 repeats doc 1's "q r s t u" run inside unique context: the
    # shared run is stripped from doc 2 only; unique tokens survive.
    df = _docs(
        spark,
        [
            (1, "q r s t u aa bb cc"),
            (2, "dd ee q r s t u ff"),
        ],
    )
    st = {r["doc_id"]: r for r in D.substring_strip(df, "doc_id", "text", window=W).collect()}
    assert st[1]["kept_text"] == "q r s t u aa bb cc"  # canonical side intact
    assert st[2]["kept_text"] == "dd ee ff"
    assert st[2]["n_removed"] == 5


def test_strip_short_docs_pass_through(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])  # below W: no windows at all
    st = {r["doc_id"]: r["kept_text"] for r in D.substring_strip(df, "doc_id", "text", window=W).collect()}
    assert st == {1: "a b", 2: "a b"}


def test_coverage_plan_never_shuffles_text(spark, sf_dir):
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["dedup_substring_coverage"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [seg.splitlines()[0] for seg in p.split("Exchange")[1:]]
    assert exchanges, "expected at least one exchange"
    assert all("text" not in e for e in exchanges), exchanges


def test_strip_window_key_exchange_is_text_free(spark, sf_dir):
    """The corpus-sized annotate exchange (hashpartitioning on wh) must
    carry only (id, pos, wh, packed) — token text may enter an exchange
    only in the rebuild stage, whose output IS the text."""
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["dedup_substring_strip"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    wh_exchanges = [
        seg.splitlines()[0]
        for seg in p.split("Exchange")[1:]
        if "wh" in seg.splitlines()[0]
    ]
    assert wh_exchanges, "annotate exchange (partition by wh) not found"
    assert all("text" not in e and "tok" not in e for e in wh_exchanges), wh_exchanges


def test_span_histogram_merges_runs_to_maximal_spans(spark):
    # docs 1/2 share one 5-token run ("q r s t u" → two overlapping
    # 4-windows merge to ONE maximal span of 5 tokens per doc); docs
    # 3/4 are exact 6-token duplicates (one 6-token span each)
    df = _docs(
        spark,
        [
            (1, "q r s t u aa bb cc"),
            (2, "dd ee q r s t u ff"),
            (3, "m n o p q2 r2"),
            (4, "m n o p q2 r2"),
        ],
    )
    hist = {
        r["span_len"]: r["n_spans"]
        for r in D.substring_span_histogram(df, "doc_id", "text", window=W).collect()
    }
    assert hist == {5: 2, 6: 2}, hist


def test_incremental_coverage_vs_lake(spark):
    # new doc 10 repeats lake doc 1's 5-token run; new doc 20 is clean
    new = _docs(spark, [(10, "zz q r s t u yy"), (20, "totally fresh tokens here now")])
    hist = _docs(spark, [(1, "q r s t u aa bb cc"), (2, "other lake content words")])
    cov = {
        r["doc_id"]: r
        for r in D.incremental_substring_coverage(new, hist, "doc_id", "text", window=W).collect()
    }
    assert cov[10]["lake_tokens"] == 5
    assert cov[20]["lake_tokens"] == 0 and cov[20]["lake_coverage"] == 0.0


def test_incremental_coverage_nonzero_on_corpus(spark, sf_dir):
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["decontaminate_substring_overlap"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 50  # the 10% "new batch" slice of 500 docs
    assert any(r["lake_tokens"] > 0 for r in rows)  # near-dup families cross the split
    # and the plan keeps text out of every exchange
    p = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [seg.splitlines()[0] for seg in p.split("Exchange")[1:]]
    assert all("text" not in e for e in exchanges), exchanges


def test_pos_cap_guard_raises_instead_of_corrupting(spark, monkeypatch):
    import pytest

    monkeypatch.setattr(D, "SUBSTRING_POS_CAP", 4)
    df = _docs(spark, [(1, "a b c d e f g h i j")])  # positions 0..6 > cap 4
    with pytest.raises(Exception, match="SUBSTRING_POS_CAP"):
        D.substring_annotate(df, "doc_id", "text", window=W).collect()


def test_annotate_skew_safe_equals_window_form(spark):
    """The r11 groupBy+join-back annotate must be row-identical to the
    r10 whole-partition-Window form, including on a constructed
    hot-key corpus (one boilerplate window shared by every doc — the
    exact shape that serialized the Window form onto one task)."""
    rows = [(i, f"lic hdr tok one two u{i} v{i} w{i}") for i in range(200)]
    df = _docs(spark, rows)
    a = D.substring_annotate(df, "doc_id", "text", window=W)
    b = D._substring_annotate_window_form(df, "doc_id", "text", window=W)
    sa = sorted(tuple(r) for r in a.collect())
    sb = sorted(tuple(r) for r in b.collect())
    assert sa == sb and len(sa) == 200 * 5
    # the hot windows ("lic hdr tok one" / "hdr tok one two") count 200
    hot = [t for t in sa if t[4] == 200]
    assert len(hot) == 400


def test_annotate_path_has_no_per_key_window_exec(spark, sf_dir):
    """Plan pin for the r10→r11 skew fix: no WindowExec partitioned by
    the corpus-wide window key anywhere on the annotate-consuming
    paths — per-key stats must come from partial-agg groupBy + join
    (AQE-splittable), never a whole-partition Window frame (one
    unsplittable task per hot key). The histogram entry keeps its
    PER-DOC (doc_id, pos) gaps-and-islands Window — that partitioning
    is bounded by SUBSTRING_POS_CAP, not corpus-wide."""
    from gomaxscale_spark.plans import all_queries

    q = all_queries()
    for name in ("dedup_substring_coverage", "dedup_substring_strip"):
        p = q[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in p, (name, p[:2000])
    hist = q["dedup_substring_span_histogram"].fn(spark, sf_dir)
    ph = hist._jdf.queryExecution().executedPlan().toString()
    for seg in ph.split("Window")[1:]:
        head = seg.splitlines()[0]
        assert "wh" not in head, head  # only the per-doc islands window
