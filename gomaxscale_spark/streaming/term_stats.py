"""Incremental BM25 term-statistics lake: the streaming half of the
retrieval family (operators/search.py).

BM25's corpus statistics are ADDITIVE over disjoint document batches —
per-bucket df (docs containing ≥1 token in the bucket; each doc lives
in exactly one batch), n_docs, and n_tokens are all sums — so the
stats a BM25 server scores against can be maintained as
epoch-committed DELTAS: each micro-batch lands its own
(≤ n_buckets)-row df table under ``terms/epoch=N`` and a 1-row
(n_docs, n_tokens) table under ``meta/epoch=N``, serving reads sum the
committed epochs, and compaction is a sum-merge into one base epoch.
``score()`` then answers the online question "how does this batch rank
against everything the lake has indexed so far?" with arithmetic
BIT-EQUAL to the batch operator on the same counts
(``bm25_against_stats`` — the shared ``_score_chain`` expression tree;
equality pytested).

Protocol: the repo-standard EpochCommit — markers are the commit
point, a retried epoch's markerless partial dirs are dropped before
re-apply, serving reads see committed epochs only, compaction swaps
via two renames. The per-epoch artifact is ≤ n_buckets + 1 rows
whatever the batch size (hashed vocabulary, operators/search.py), so
the lake's footprint is O(epochs × n_buckets) until compaction — KBs.

Reference scope: the CDC reference (gomaxscale.go) has no retrieval
operators; this is LLM-pipeline surface (driver north star), the
lexical-search twin of the LM lake's quality-scoring surface.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .epoch import EpochCommit

#: Contract schemas (and the empty-lake reads).
TERMS_SCHEMA = "bucket bigint, df bigint"
META_SCHEMA = "n_docs bigint, n_tokens bigint"

_SUBS = ("terms", "meta")


class TermStatsLakeSink:
    """foreachBatch sink maintaining hashed-vocabulary BM25 corpus
    statistics under ``path`` and serving online BM25 scores against
    them."""

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int | None = None,
        compact_every: int | None = None,
    ) -> None:
        from ..operators.search import N_TERM_BUCKETS

        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = N_TERM_BUCKETS if n_buckets is None else n_buckets
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
            and len(self._commit.committed_epoch_dirs("terms"))
            >= self.compact_every
        ):
            self.compact(batch_df.sparkSession)

    def _apply_batch_locked(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.search import corpus_term_stats

        self._commit.finish_swap(_SUBS)
        self._commit.clean_partial(_SUBS, epoch_id)
        terms, meta = corpus_term_stats(
            batch_df, self.n_buckets, self.id_col, self.text_col
        )
        terms.write.mode("overwrite").parquet(
            f"{self.path}/terms/epoch={epoch_id}"
        )
        meta.write.mode("overwrite").parquet(f"{self.path}/meta/epoch={epoch_id}")
        self._commit.commit(epoch_id)

    def read_stats(self, spark) -> tuple[DataFrame, DataFrame]:
        """The aggregated (bucket, df) + (n_docs, n_tokens) statistics
        over COMMITTED epochs — deltas are additive, so the sum IS the
        whole-corpus artifact. Empty lake → empty/zero frames with the
        contract schemas."""
        term_dirs = self._commit.committed_epoch_dirs("terms")
        meta_dirs = self._commit.committed_epoch_dirs("meta")
        if not term_dirs or not meta_dirs:
            return (
                spark.createDataFrame([], TERMS_SCHEMA),
                spark.createDataFrame([(0, 0)], META_SCHEMA),
            )
        terms = (
            spark.read.parquet(*term_dirs)
            .groupBy("bucket")
            .agg(F.sum("df").alias("df"))
        )
        meta = spark.read.parquet(*meta_dirs).agg(
            F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
        )
        return terms, meta

    def score(self, docs: DataFrame, terms: Sequence[str]) -> DataFrame:
        """Online BM25 for ``docs`` against the lake statistics:
        (id, score) — identical expression tree to the batch operator
        (read-only, committed epochs only)."""
        from ..operators.search import bm25_against_stats

        t, m = self.read_stats(docs.sparkSession)
        return bm25_against_stats(
            docs, terms, t, m, self.n_buckets,
            id_col=self.id_col, text_col=self.text_col,
        )

    def topk(self, docs: DataFrame, terms: Sequence[str], k: int) -> DataFrame:
        """Top-k of ``score`` — TakeOrdered, id tie-break."""
        return (
            self.score(docs, terms)
            .orderBy(F.desc("score"), F.col(self.id_col))
            .limit(k)
        )

    def topk_batch(
        self, docs: DataFrame, queries: Sequence[Sequence[str]], k: int
    ) -> DataFrame:
        """The serving hot path (r14): per-query top-k for SEVERAL
        queries in one pass over ``docs``, df/avgdl from the lake's
        committed stats — (query_id, id, score). Arithmetic bit-equal
        to ``bm25_topk_batch_against_stats`` on a batch stats artifact
        with the same counts (additive-delta invariant, pytested)."""
        from ..operators.search import bm25_topk_batch_against_stats

        t, m = self.read_stats(docs.sparkSession)
        return bm25_topk_batch_against_stats(
            docs, queries, t, m, k, self.n_buckets,
            id_col=self.id_col, text_col=self.text_col,
        )

    def compact(self, spark, target_files: int = 1) -> None:
        """Sum-merge every committed epoch's deltas into one base epoch
        per sub (two-rename swap; markers kept so replays stay no-ops;
        markerless partials dropped first). Merged tables are
        ≤ n_buckets + 1 rows — one file is the right default."""
        with self._commit.maintenance_guard():
            self._commit.finish_swap(_SUBS)
            committed = self._commit.drop_partial_epochs(_SUBS)
            if len(committed) <= 1 or not os.path.isdir(f"{self.path}/terms"):
                return
            base = max(committed)
            terms = (
                spark.read.parquet(f"{self.path}/terms")
                .drop("epoch")
                .groupBy("bucket")
                .agg(F.sum("df").alias("df"))
            )
            meta = (
                spark.read.parquet(f"{self.path}/meta")
                .drop("epoch")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                )
            )
            self._commit.swap_publish(
                "terms",
                lambda staging: (
                    terms.coalesce(target_files)
                    .write.mode("overwrite")
                    .parquet(f"{staging}/epoch={base}")
                ),
            )
            self._commit.swap_publish(
                "meta",
                lambda staging: (
                    meta.coalesce(target_files)
                    .write.mode("overwrite")
                    .parquet(f"{staging}/epoch={base}")
                ),
            )
