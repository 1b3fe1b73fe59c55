"""Incremental tokenizer-VOCABULARY lake: the streaming half of the
tokenizer family (operators/text.py).

A BPE trainer's corpus state is its word-frequency VOCABULARY — and
word counts are trivially ADDITIVE over disjoint document batches, so
the vocabulary a tokenizer trains against can be maintained exactly
like the BM25 term-statistics lake: each micro-batch lands its own
(w, wc) delta under ``vocab/epoch=N`` behind the repo-standard
EpochCommit protocol, serving reads SUM the committed epochs, and
compaction is a sum-merge into one base epoch.

This is what makes tokenizer statistics INCREMENTAL at 100 TB: the
corpus streams in once (the ingest the pipeline absorbs anyway), and
every retraining decision — merge candidates, fertility, OOV — runs
against the vocabulary-sized lake without ever rescanning text. The
serving read here is the family's round-1 statistic (adjacent
character-pair counts, whose argmax is BPE's first merge) computed by
the SAME operator core as the batch entry
(``text.pair_counts_from_vocab``; batch ≡ lake equality pytested).

Batch-split invariance: per-epoch word counts sum to the corpus word
counts whatever file-to-batch assignment the engine picks, so a
streaming ingest is oracle-checkable by the same SQL as the batch
``text_bpe_pair_counts`` operator.

Reference scope: the CDC reference (gomaxscale.go) has no analytics
surface; this is LLM-pipeline surface (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import tokenize
from .epoch import EpochCommit

#: Contract schema (and the empty-lake read).
VOCAB_SCHEMA = "w string, wc bigint"

_SUBS = ("vocab",)


class VocabLakeSink:
    """foreachBatch sink maintaining the corpus word-frequency
    vocabulary under ``path`` and serving tokenizer statistics
    against it."""

    def __init__(
        self,
        path: str,
        text_col: str = "text",
        compact_every: int | None = None,
    ) -> None:
        self.path = path
        self.text_col = text_col
        self.compact_every = compact_every
        self._commit = EpochCommit(path)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.apply_batch(batch_df, epoch_id)

    def apply_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        if self._commit.is_committed(epoch_id):
            return  # retried epoch — already committed
        with self._commit.trigger_guard():
            self._commit.finish_swap(_SUBS)
            self._commit.clean_partial(_SUBS, epoch_id)
            (
                batch_df.select(
                    F.explode(
                        tokenize(F.lower(F.col(self.text_col)))
                    ).alias("w")
                )
                .groupBy("w")
                .agg(F.count(F.lit(1)).cast("long").alias("wc"))
                .write.mode("overwrite")
                .parquet(f"{self.path}/vocab/epoch={epoch_id}")
            )
            self._commit.commit(epoch_id)
        if (
            self.compact_every is not None
            and len(self._commit.committed_epoch_dirs("vocab"))
            >= self.compact_every
        ):
            self.compact(batch_df.sparkSession)

    def read_vocab(self, spark) -> DataFrame:
        """The summed (w, wc) vocabulary over COMMITTED epochs —
        per-epoch counts are additive, so the sum IS the corpus
        vocabulary. Empty lake → empty frame with the contract
        schema."""
        dirs = self._commit.committed_epoch_dirs("vocab")
        if not dirs:
            return spark.createDataFrame([], VOCAB_SCHEMA)
        return (
            spark.read.parquet(*dirs)
            .groupBy("w")
            .agg(F.sum("wc").cast("long").alias("wc"))
        )

    def pair_counts(self, spark, k: int = 20) -> DataFrame:
        """BPE round-1 merge candidates off the committed vocabulary —
        the SAME operator core as the batch ``text_bpe_pair_counts``
        entry (``pair_counts_from_vocab``), so batch ≡ lake is an
        identity, not a coincidence (read-only, committed epochs
        only)."""
        from ..operators.text import pair_counts_from_vocab

        return pair_counts_from_vocab(self.read_vocab(spark), k)

    def compact(self, spark, target_files: int = 1) -> None:
        """Sum-merge every committed epoch's vocabulary delta into one
        base epoch (two-rename swap; markers kept so replays stay
        no-ops; markerless partials dropped first)."""
        import os

        with self._commit.maintenance_guard():
            self._commit.finish_swap(_SUBS)
            committed = self._commit.drop_partial_epochs(_SUBS)
            if len(committed) <= 1 or not os.path.isdir(
                f"{self.path}/vocab"
            ):
                return
            base = max(committed)
            merged = (
                spark.read.parquet(f"{self.path}/vocab")
                .drop("epoch")
                .groupBy("w")
                .agg(F.sum("wc").cast("long").alias("wc"))
            )
            self._commit.swap_publish(
                "vocab",
                lambda staging: (
                    merged.coalesce(target_files)
                    .write.mode("overwrite")
                    .parquet(f"{staging}/epoch={base}")
                ),
            )
