"""SFT / instruction-data assembly: the operators between a curated
corpus and a FINE-TUNING consumer.

Pretraining packs a flat token stream (operators/sampling.py);
supervised fine-tuning consumes CONVERSATIONS — ordered role-tagged
turns — and needs a different last mile: transcript assembly with a
stable identity, loss-mask span computation (train on assistant
turns, mask prompts), prompt-level dedup (the SFT analogue of exact
document dedup — near-identical prompts with different completions
leak across splits and double-count in training), and context-budget
truncation that keeps the most recent turns.

All operators take a TURNS frame — (conversation, turn_idx, role,
text) — the shape any chat-data store exports. Scale discipline:
per-turn digests and token counts fold AT THE SCAN, so the
conversation-keyed shuffles carry fixed-width rows (digest chaining —
transcript identity is the md5 over ordered per-turn digests, never
assembled text); every window is partitioned by conversation, the
same key an SFT shard write needs.

Reference scope note: the reference consumer (gomaxscale.go) has no
analytics surface; this module is part of the mandated LLM-pipeline
extension (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _n_tokens(text: Column) -> Column:
    """Whitespace token count — the repo-standard portable tokenizer."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != "")).cast(
        "long"
    )


def assemble_conversations(
    turns: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
) -> DataFrame:
    """Per-conversation assembly card: (conversation, n_turns,
    n_user_turns, n_assistant_turns, total_chars, transcript_digest).

    ``transcript_digest`` is the md5 over the turn-ordered
    ``role:md5(text)`` chain — a content address for the WHOLE
    conversation (role changes and reorderings change it, as they
    must) that never requires assembling the transcript text.

    Scale: per-turn md5 + length fold at the scan, so the ONE
    conversation-keyed exchange carries ~40-byte rows; the ordered
    chain is an array_sort over the collected (turn_idx, role,
    digest) structs — bounded by turns-per-conversation, not corpus
    size.
    """
    per_turn = turns.select(
        F.col(conv_col),
        F.col(turn_col).cast("long").alias("__turn"),
        F.col(role_col).alias("__role"),
        F.md5(F.col(text_col)).alias("__digest"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
    )
    return (
        per_turn.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum((F.col("__role") == "user").cast("long")).alias(
                "n_user_turns"
            ),
            F.sum((F.col("__role") == "assistant").cast("long")).alias(
                "n_assistant_turns"
            ),
            F.sum("__chars").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("__turn", "__role", "__digest")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":", s["__role"], s["__digest"]
                        ),
                    ),
                )
            ).alias("transcript_digest"),
        )
    )


def loss_mask_spans(
    turns: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    train_role: str = "assistant",
) -> DataFrame:
    """Per-turn LOSS-MASK spans in the flattened token stream:
    (conversation, turn_idx, role, n_tokens, start_tok, end_tok,
    trainable) — ``start_tok`` is the running token offset of the
    turn inside its conversation (turn order), ``trainable`` is true
    for ``train_role`` turns (the standard SFT recipe: cross-entropy
    on assistant tokens, prompts masked). Integer-exact throughout.

    Scale: ONE conversation-keyed exchange; the cumsum window is
    partition-local over (turn_idx) — the same partitioning the
    masked-shard write needs. Zero-token turns get empty spans
    (start == end) and stay in the output (the mask array must cover
    every turn).
    """
    base = turns.select(
        F.col(conv_col),
        F.col(turn_col).cast("long").alias("turn_idx"),
        F.col(role_col).alias("role"),
        _n_tokens(F.col(text_col)).alias("n_tokens"),
    )
    w = W.partitionBy(conv_col).orderBy("turn_idx")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    return base.select(
        F.col(conv_col),
        "turn_idx",
        "role",
        "n_tokens",
        start.alias("start_tok"),
        (start + F.col("n_tokens")).alias("end_tok"),
        (F.col("role") == train_role).alias("trainable"),
    )


def dedup_by_prompt(
    turns: DataFrame,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
    prompt_role: str = "user",
    prefix_tokens: int | None = None,
) -> DataFrame:
    """Prompt-level conversation dedup: group conversations by the
    digest of their FIRST ``prompt_role`` turn and report groups with
    more than one member — (prompt_digest, n_convs, keep_conv) with
    the lowest conversation id surviving (the exact-dedup contract of
    ``dedup_exact_hashed`` applied to the prompt axis: duplicated
    prompts with divergent completions are how SFT sets leak across
    splits and double-count at training).

    ``prefix_tokens`` keys on the first N whitespace tokens of the
    prompt instead of the whole turn — instruction preambles
    duplicate even when the prompt tail and every completion diverge,
    and the prefix is what retrieval-augmented or templated SFT sets
    actually repeat. None = whole-turn exact digest.

    Scale: the first-prompt selection is a min_by over one
    conversation-keyed partial agg; the group stage shuffles 32-byte
    digests only — text never moves.
    """
    prompt_text: Column = F.col(text_col)
    if prefix_tokens is not None:
        prompt_text = F.concat_ws(
            " ",
            F.slice(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""),
                1,
                int(prefix_tokens),
            ),
        )
    prompts = (
        turns.filter(F.col(role_col) == prompt_role)
        .groupBy(conv_col)
        .agg(
            F.min_by(
                F.md5(prompt_text), F.col(turn_col).cast("long")
            ).alias("prompt_digest")
        )
    )
    return (
        prompts.groupBy("prompt_digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.min(conv_col).alias("keep_conv"),
        )
        .filter(F.col("n_convs") > 1)
    )


def truncate_to_budget(
    turns: DataFrame,
    conv_col: str,
    turn_col: str,
    text_col: str,
    budget: int = 256,
) -> DataFrame:
    """Context-budget truncation card: per conversation, the longest
    SUFFIX of turns that fits a ``budget``-token context window —
    the standard chat-serving/fine-tuning trim (keep the most recent
    turns, drop history) — as (conversation, n_turns, kept_turns,
    dropped_turns, kept_tokens, total_tokens). A turn is kept iff
    the running token total from the conversation END (inclusive of
    the turn) is ≤ budget, so a single over-budget latest turn keeps
    nothing (kept_turns 0 — the caller's signal to split, not ours
    to guess).

    Scale: ONE conversation-keyed exchange; the suffix cumsum is the
    same partition-local window as ``loss_mask_spans`` with the sort
    reversed; the card agg is partial-aggregable.
    """
    base = turns.select(
        F.col(conv_col),
        F.col(turn_col).cast("long").alias("__turn"),
        _n_tokens(F.col(text_col)).alias("__tok"),
    )
    w = W.partitionBy(conv_col).orderBy(F.desc("__turn"))
    from_end = F.sum("__tok").over(w.rowsBetween(W.unboundedPreceding, 0))
    kept = (from_end <= F.lit(int(budget))).cast("long")
    return (
        base.select(
            F.col(conv_col),
            F.col("__tok"),
            kept.alias("__kept"),
        )
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("__kept").cast("long").alias("kept_turns"),
            (F.count(F.lit(1)) - F.sum("__kept"))
            .cast("long")
            .alias("dropped_turns"),
            F.sum(F.col("__tok") * F.col("__kept"))
            .cast("long")
            .alias("kept_tokens"),
            F.sum("__tok").cast("long").alias("total_tokens"),
        )
    )
