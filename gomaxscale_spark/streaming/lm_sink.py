"""Incremental hashed-unigram LM lake: the streaming half of DSIR
quality scoring (operators/sampling.py).

Hashed bag-of-words counts are ADDITIVE — a corpus's (bucket, rc, tc)
table is the SUM of its batches' tables — so the LM that DSIR scores
against can be maintained as epoch-committed count DELTAS: each
micro-batch lands its own ≤ n_buckets-row count table under
``lm/epoch=N``, serving reads sum the committed epochs, and compaction
is a sum-merge into one base epoch. ``score()`` then answers the
online question "how target-like is this document under everything
the lake has seen so far?" with arithmetic BIT-EQUAL to the batch
operator on the same counts (``dsir_score_against_lm`` — the batch
``dsir_log_weights`` delegates to the identical code path; equality
pytested).

Protocol: the repo-standard EpochCommit — markers are the commit
point, a retried epoch's markerless partial dir is dropped before
re-apply, serving reads see committed epochs only, compaction swaps
via two renames. The per-epoch artifact is ≤ n_buckets rows whatever
the batch size, so the lake's total footprint is
O(epochs × n_buckets) until the next compaction — KBs, not corpus.

Reference scope: the CDC reference (gomaxscale.go) has no corpus
operators; this is LLM-pipeline surface (driver north star), the
quality-scoring twin of the substring key lake's decontamination
surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .epoch import EpochCommit

#: Contract schema of the lake's count table (and of ``read_lm`` on an
#: empty lake).
LM_SCHEMA = "bucket bigint, rc bigint, tc bigint"


class IncrementalLMSink:
    """foreachBatch sink maintaining the DSIR reference LM under
    ``path`` and serving online importance scores against it.

    ``target_sql`` is a SQL boolean over the batch rows (e.g.
    ``"lang = 'en'"``) marking the trusted/target slice — a string,
    not a Column, so the sink is constructible before any DataFrame
    exists (the foreachBatch pattern).
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        target_sql: str = "lang = 'en'",
        n_buckets: int = 4096,
        compact_every: int | None = None,
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.target_sql = target_sql
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self._commit = EpochCommit(path)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.apply_batch(batch_df, epoch_id)

    def apply_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        if self._commit.is_committed(epoch_id):
            return  # retried epoch — already committed
        with self._commit.trigger_guard():
            self._apply_batch_locked(batch_df, epoch_id)
        if (
            self.compact_every is not None
            and len(self._commit.committed_epoch_dirs("lm")) >= self.compact_every
        ):
            self.compact(batch_df.sparkSession)

    def _apply_batch_locked(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.sampling import dsir_token_buckets

        self._commit.finish_swap(("lm",))
        self._commit.clean_partial(("lm",), epoch_id)
        rows = dsir_token_buckets(
            batch_df.withColumn(
                "__t", F.expr(self.target_sql).cast("long")
            ),
            self.id_col,
            self.text_col,
            self.n_buckets,
            carry=("__t",),
        )
        delta = rows.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("rc"), F.sum("__t").alias("tc")
        )
        delta.write.mode("overwrite").parquet(f"{self.path}/lm/epoch={epoch_id}")
        self._commit.commit(epoch_id)

    def read_lm(self, spark) -> DataFrame:
        """The aggregated (bucket, rc, tc) LM over COMMITTED epochs —
        count deltas are additive, so the sum IS the whole-corpus LM.
        Empty lake → empty frame with the contract schema."""
        dirs = self._commit.committed_epoch_dirs("lm")
        if not dirs:
            return spark.createDataFrame([], LM_SCHEMA)
        return (
            spark.read.parquet(*dirs)
            .groupBy("bucket")
            .agg(F.sum("rc").alias("rc"), F.sum("tc").alias("tc"))
        )

    def score(self, docs: DataFrame) -> DataFrame:
        """Online DSIR log importance weights for ``docs`` against the
        lake LM: (id, n_tokens, weight_micro) — identical µ-nat
        arithmetic to the batch operator (read-only, committed epochs
        only)."""
        from ..operators.sampling import dsir_score_against_lm

        return dsir_score_against_lm(
            docs, self.read_lm(docs.sparkSession),
            self.id_col, self.text_col, self.n_buckets,
        )

    def resample(self, docs: DataFrame, k: int) -> DataFrame:
        """Gumbel-top-k over the online scores — the deterministic
        without-replacement sample ∝ exp(weight)."""
        from ..operators.sampling import dsir_resample

        return dsir_resample(self.score(docs), self.id_col, k)

    def compact(self, spark, target_files: int = 1) -> None:
        """Sum-merge every committed epoch's deltas into one base epoch
        (two-rename swap; markers kept so replays stay no-ops;
        markerless partials dropped first). The merged table is
        ≤ n_buckets rows — one file is the right default."""
        with self._commit.maintenance_guard():
            self._commit.finish_swap(("lm",))
            committed = self._commit.drop_partial_epochs(("lm",))
            if len(committed) <= 1 or not os.path.isdir(f"{self.path}/lm"):
                return
            base = max(committed)
            merged = (
                spark.read.parquet(f"{self.path}/lm")
                .drop("epoch")
                .groupBy("bucket")
                .agg(F.sum("rc").alias("rc"), F.sum("tc").alias("tc"))
            )
            self._commit.swap_publish(
                "lm",
                lambda staging: (
                    merged.coalesce(target_files)
                    .write.mode("overwrite")
                    .parquet(f"{staging}/epoch={base}")
                ),
            )
