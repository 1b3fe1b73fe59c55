"""r16 family: SFT / instruction-data assembly (operators/sft.py) and
the incremental tokenizer-vocabulary lake (streaming/vocab_lake.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.sft import (
    assemble_conversations,
    dedup_by_prompt,
    loss_mask_spans,
    truncate_to_budget,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv long, turn long, role string, text string"
    )


# ------------------------------------------------- transcript assembly


def test_assemble_counts_and_digest_stability(spark):
    t = _turns(
        spark,
        [
            (1, 0, "user", "hi there"),
            (1, 1, "assistant", "hello"),
            (1, 2, "user", "bye"),
            (2, 0, "user", "hi there"),
            (2, 1, "assistant", "hello"),
            (2, 2, "user", "bye"),
        ],
    )
    rows = {
        r.conv: r
        for r in assemble_conversations(t, "conv", "turn", "role", "text").collect()
    }
    assert rows[1].n_turns == 3
    assert rows[1].n_user_turns == 2 and rows[1].n_assistant_turns == 1
    assert rows[1].total_chars == len("hi there") + len("hello") + len("bye")
    # identical conversations -> identical content address
    assert rows[1].transcript_digest == rows[2].transcript_digest


def test_assemble_digest_sensitive_to_order_and_role(spark):
    base = [(1, 0, "user", "a"), (1, 1, "assistant", "b")]
    swapped = [(1, 0, "user", "b"), (1, 1, "assistant", "a")]
    rerole = [(1, 0, "assistant", "a"), (1, 1, "user", "b")]
    digs = []
    for rows in (base, swapped, rerole):
        digs.append(
            assemble_conversations(
                _turns(spark, rows), "conv", "turn", "role", "text"
            )
            .collect()[0]
            .transcript_digest
        )
    assert len(set(digs)) == 3  # order and role both change identity


# ------------------------------------------------------- loss masking


def test_loss_mask_spans_partition_the_stream(spark, sf_dir):
    from gomaxscale_spark.plans import all_queries

    rows = (
        all_queries()["sft_loss_mask_spans"].fn(spark, sf_dir).collect()
    )
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert by_conv
    for turns in by_conv.values():
        turns.sort(key=lambda r: r.turn_idx)
        assert turns[0].start_tok == 0
        for a, b in zip(turns, turns[1:]):
            assert a.end_tok == b.start_tok  # contiguous spans
        for r in turns:
            assert r.end_tok - r.start_tok == r.n_tokens
            assert r.trainable == (r.role == "assistant")


def test_loss_mask_zero_token_turn_keeps_empty_span(spark):
    t = _turns(
        spark,
        [(1, 0, "user", "one two"), (1, 1, "assistant", ""), (1, 2, "user", "x")],
    )
    rows = sorted(
        loss_mask_spans(t, "conv", "turn", "role", "text").collect(),
        key=lambda r: r.turn_idx,
    )
    assert rows[1].start_tok == rows[1].end_tok == 2
    assert rows[2].start_tok == 2 and rows[2].end_tok == 3


# ------------------------------------------------------- prompt dedup


def test_dedup_by_prompt_exact_and_prefix(spark):
    t = _turns(
        spark,
        [
            (1, 0, "user", "summarize this text please alpha"),
            (1, 1, "assistant", "sure"),
            (2, 0, "user", "summarize this text please beta"),
            (2, 1, "assistant", "ok"),
            (3, 0, "user", "translate to french"),
            (3, 1, "assistant", "non"),
        ],
    )
    # whole-turn exact: no duplicates
    assert (
        dedup_by_prompt(t, "conv", "turn", "role", "text").count() == 0
    )
    # 4-token prefix: convs 1 and 2 share "summarize this text please"
    rows = dedup_by_prompt(
        t, "conv", "turn", "role", "text", prefix_tokens=4
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_convs == 2 and rows[0].keep_conv == 1


def test_dedup_by_prompt_uses_first_user_turn(spark):
    t = _turns(
        spark,
        [
            (1, 1, "user", "same prompt"),
            (1, 0, "assistant", "sys"),
            (2, 0, "user", "same prompt"),
            (2, 1, "assistant", "r"),
        ],
    )
    rows = dedup_by_prompt(t, "conv", "turn", "role", "text").collect()
    assert len(rows) == 1 and rows[0].n_convs == 2


# ------------------------------------------------- context truncation


def test_truncate_budget_keeps_suffix(spark):
    t = _turns(
        spark,
        [
            (1, 0, "user", "a b c d"),       # 4 tokens
            (1, 1, "assistant", "e f g"),    # 3
            (1, 2, "user", "h i"),           # 2
        ],
    )
    r = truncate_to_budget(t, "conv", "turn", "text", budget=5).collect()[0]
    # from the end: turn2 (2) fits, turn1 (2+3=5) fits, turn0 (9) not
    assert r.n_turns == 3 and r.kept_turns == 2 and r.dropped_turns == 1
    assert r.kept_tokens == 5 and r.total_tokens == 9


def test_truncate_budget_overlong_latest_turn_keeps_nothing(spark):
    t = _turns(spark, [(1, 0, "user", "a b c d e f")])
    r = truncate_to_budget(t, "conv", "turn", "text", budget=3).collect()[0]
    assert r.kept_turns == 0 and r.kept_tokens == 0 and r.dropped_turns == 1


# ------------------------------------------------ vocabulary lake


def test_vocab_lake_batch_equals_lake(spark, sf_dir, tmp_path):
    """Disjoint-batch ingest sums to the corpus vocabulary: the lake's
    pair counts equal the batch operator's, row for row."""
    from gomaxscale_spark.operators.text import bpe_pair_counts
    from gomaxscale_spark.streaming.vocab_lake import VocabLakeSink

    d = load_table(spark, sf_dir, "documents")
    sink = VocabLakeSink(str(tmp_path / "vlake"), "text")
    sink.apply_batch(d.filter(F.col("doc_id") % 3 == 0), 0)
    sink.apply_batch(d.filter(F.col("doc_id") % 3 == 1), 1)
    sink.apply_batch(d.filter(F.col("doc_id") % 3 == 2), 2)
    lake = [tuple(r) for r in sink.pair_counts(spark, k=20).collect()]
    batch = [tuple(r) for r in bpe_pair_counts(d, "text", k=20).collect()]
    assert lake == batch


def test_vocab_lake_retried_epoch_is_noop_and_compact_preserves(
    spark, sf_dir, tmp_path
):
    from gomaxscale_spark.streaming.vocab_lake import VocabLakeSink

    d = load_table(spark, sf_dir, "documents")
    sink = VocabLakeSink(str(tmp_path / "vlake2"), "text")
    half = d.filter(F.col("doc_id") % 2 == 0)
    sink.apply_batch(half, 0)
    sink.apply_batch(half, 0)  # retry — must not double-count
    sink.apply_batch(d.filter(F.col("doc_id") % 2 == 1), 1)
    total = sink.read_vocab(spark).agg(F.sum("wc")).collect()[0][0]
    before = sorted(tuple(r) for r in sink.read_vocab(spark).collect())
    sink.compact(spark)
    after = sorted(tuple(r) for r in sink.read_vocab(spark).collect())
    assert before == after
    expected = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        )
    ).count()
    assert total == expected


def test_vocab_lake_empty_serves_empty(spark, tmp_path):
    from gomaxscale_spark.streaming.vocab_lake import VocabLakeSink

    sink = VocabLakeSink(str(tmp_path / "vlake3"), "text")
    assert sink.read_vocab(spark).count() == 0
    assert sink.pair_counts(spark, k=5).count() == 0


def test_assemble_no_text_in_shuffle(spark, sf_dir):
    """The digest-chaining contract at 100 TB: the conversation-keyed
    aggregation consumes per-turn digests computed at the scan — no
    raw text attribute survives above the scan-side projection."""
    from gomaxscale_spark.plans import all_queries

    df = all_queries()["sft_assemble_conversations"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan
    # plans print top-down: Aggregate (shuffle consumer) precedes the
    # scan-side Project; text# may appear only in/below that Project
    proj_idx = plan.index("Project")
    assert "text#" not in plan[:proj_idx]
