"""Incremental corpus MANIFEST lake: the streaming half of the r15
versioning family (operators/versioning.py).

A corpus release's manifest — (id, md5(text)) for every document — is
trivially ADDITIVE over disjoint document batches (each id lives in
exactly one micro-batch), so it can be maintained exactly like the
BM25 term-statistics lake: each micro-batch lands its own
(id, digest) table under ``manifest/epoch=N`` behind the repo-standard
EpochCommit protocol, serving reads union the committed epochs, and a
release DIFF against any older manifest is the digest-level
``manifest_diff`` — content never re-read, never shuffled.

This is what makes release diffing INCREMENTAL at 100 TB: the new
version streams in once (the ingest the lake absorbs anyway), and the
diff runs manifest-vs-manifest — two (id, 32-byte) frames — however
large the corpus text is.

Batch-split invariance: the union of disjoint per-epoch manifests is
the same set whatever file-to-batch assignment the engine picks, so a
streaming ingest is oracle-checkable by the SAME SQL as the batch
``corpus_version_diff`` operator (pytested).

Reference scope: the CDC reference (gomaxscale.go) has no analytics
surface; this is LLM-pipeline surface (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .epoch import EpochCommit

#: Contract schema (and the empty-lake read).
MANIFEST_SCHEMA = "__id bigint, digest string"

_SUBS = ("manifest",)


class ManifestLakeSink:
    """foreachBatch sink maintaining the corpus (id, digest) manifest
    under ``path`` and serving release diffs against it."""

    def __init__(
        self, path: str, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self._commit = EpochCommit(path)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.apply_batch(batch_df, epoch_id)

    def apply_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        if self._commit.is_committed(epoch_id):
            return  # retried epoch — already committed
        with self._commit.trigger_guard():
            self._commit.finish_swap(_SUBS)
            self._commit.clean_partial(_SUBS, epoch_id)
            batch_df.select(
                F.col(self.id_col).cast("long").alias("__id"),
                F.md5(F.col(self.text_col)).alias("digest"),
            ).write.mode("overwrite").parquet(
                f"{self.path}/manifest/epoch={epoch_id}"
            )
            self._commit.commit(epoch_id)

    def read_manifest(self, spark) -> DataFrame:
        """The (``__id``, digest) manifest over COMMITTED epochs —
        batches are id-disjoint, so the union IS the corpus manifest.
        Empty lake → empty frame with the contract schema."""
        dirs = self._commit.committed_epoch_dirs("manifest")
        if not dirs:
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        return spark.read.parquet(*dirs).select("__id", "digest")

    def diff_against(self, old: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Release diff: ``old`` (a document frame) vs the lake's
        committed manifest as the NEW version — the digest-level
        ``manifest_diff``, identical output contract to the batch
        ``corpus_version_diff`` (old's digests fold at its scan; the
        lake side reads digests it already stores)."""
        from ..operators.versioning import manifest_diff

        o = old.select(
            F.col(id_col).cast("long").alias("__id"),
            F.md5(F.col(text_col)).alias("old_digest"),
        )
        n = self.read_manifest(old.sparkSession).select(
            "__id", F.col("digest").alias("new_digest")
        )
        return manifest_diff(o, n, id_col)

    def compact(self, spark, target_files: int = 1) -> None:
        """Merge every committed epoch's manifest into one base epoch
        (two-rename swap; markers kept so replays stay no-ops;
        markerless partials dropped first)."""
        import os

        with self._commit.maintenance_guard():
            self._commit.finish_swap(_SUBS)
            committed = self._commit.drop_partial_epochs(_SUBS)
            if len(committed) <= 1 or not os.path.isdir(
                f"{self.path}/manifest"
            ):
                return
            base = max(committed)
            merged = (
                spark.read.parquet(f"{self.path}/manifest")
                .drop("epoch")
                .select("__id", "digest")
            )
            self._commit.swap_publish(
                "manifest",
                lambda staging: (
                    merged.coalesce(target_files)
                    .write.mode("overwrite")
                    .parquet(f"{staging}/epoch={base}")
                ),
            )
