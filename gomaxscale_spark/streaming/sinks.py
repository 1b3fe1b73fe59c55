"""Sinks: routed parquet writes and a CDC-applying snapshot sink.

The reference's only sink is the user callback / stdout demo
(gomaxscale.go:173-191, cmd/gomaxscale/main.go); an analytics engine
needs the write path too:

- ``write_routed``: partitionBy(event_type) parquet — C1 routing as a
  storage layout, so downstream readers prune by change kind.
- ``CDCSnapshotSink``: a foreachBatch sink that folds each micro-batch
  of change events into a materialized snapshot table (C2 incrementally
  — the streaming twin of operators/snapshot.py).

Scale: the snapshot sink's read-merge-rewrite is the lakehouse-less
emulation of MERGE INTO; at 100 TB you'd point the same foreachBatch at
Delta/Iceberg MERGE (jars not present here — see pyspark_guide "CDC /
SCD2"). The fold itself (union + window latest-wins) is identical; only
the storage commit changes. Rewrites are scoped per key-hash bucket via
partitioned output so a micro-batch touching few keys rewrites few
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.snapshot import materialize_snapshot


def write_routed(df: DataFrame, path: str, route_col: str = "event_type", mode: str = "overwrite") -> None:
    """Event-type-routed parquet layout (C1): one directory per change
    kind; filters on the route column become partition pruning."""
    df.write.mode(mode).partitionBy(route_col).parquet(path)


class CDCSnapshotSink:
    """foreachBatch handler maintaining table state under ``path``.

    Usage::

        sink = CDCSnapshotSink(path, key_cols=["id"],
                               order_cols=["sequence", "event_number"])
        stream.writeStream.foreachBatch(sink).start()
    """

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        event_type_col: str = "event_type",
        n_buckets: int = 16,
    ) -> None:
        self.path = path
        self.key_cols = key_cols
        self.order_cols = order_cols
        self.event_type_col = event_type_col
        self.n_buckets = n_buckets

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.apply_batch(batch_df)

    def apply_batch(self, batch_df: DataFrame) -> None:
        """Merge one micro-batch of change events into the snapshot.

        Order-robust: existing snapshot rows keep their order columns, so
        folding (current ∪ batch) with the same latest-wins window makes
        the result independent of micro-batch arrival order. A delete
        wins over any older row; its tombstone is not retained past the
        merge (an insert older than an applied delete arriving *later*
        would resurrect the row — the classic tombstone-GC tradeoff,
        acceptable because the CDC source delivers per-key order)."""
        spark = batch_df.sparkSession
        try:
            current = spark.read.parquet(self.path).drop("__bucket")
            merged_input = current.unionByName(batch_df)
        except Exception:
            merged_input = batch_df
        new_state = materialize_snapshot(
            merged_input, self.key_cols, self.order_cols, self.event_type_col
        )
        bucket = F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets)).alias("__bucket")
        tmp = self.path + "._staged"
        new_state.withColumn("__bucket", bucket).write.mode("overwrite").partitionBy(
            "__bucket"
        ).parquet(tmp)
        # atomic-ish swap (single-FS rename; a lake table would commit a
        # transaction instead)
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        shutil.move(tmp, self.path)

    def read_snapshot(self, spark) -> DataFrame:
        return spark.read.parquet(self.path).drop("__bucket")


class IncrementalLSHDedupSink:
    """foreachBatch handler maintaining a DEDUPLICATED document lake
    under ``path`` — the streaming form of the batch-vs-lake dedup
    (operators/dedup.py::incremental_dedup) extended with the MinHash-
    LSH near-dup layer: "dedupe today's crawl against everything ever
    kept", continuously.

    State layout (parquet):
      ``kept/``   — surviving documents + their content digest
      ``bands/``  — (doc_id, band_id, band_hash) LSH band rows of every
                    kept doc: the lake-side index the next batch joins
                    against, so cross-batch candidate generation costs
                    a band-key equi-join — never a scan of lake text

    Per micro-batch:
      1. exact layer: md5-digest anti-join vs kept digests + min-id
         within batch (transitive-free, so batch-split-invariant);
      2. cross-batch near-dup: batch band rows ⨝ lake band rows →
         candidate (lake_id, batch_id) pairs → exact-Jaccard verify
         (text pulled only for candidate-adjacent docs) → matched batch
         docs drop (greedy: the earlier-kept doc stays the
         representative);
      3. within-batch near-dup: the bounded LSH pipeline + star-CC,
         keep the min-id representative per cluster;
      4. append survivors to ``kept/`` and their band rows to
         ``bands/``.

    Semantics: greedy first-seen-kept. The kept set is always an
    independent set of the verified match graph (no two kept docs are
    verified near-dups); cross-batch it can differ from the all-at-once
    CC clustering on chain cases (a~b, b~c, a≁c split across batches) —
    the standard online/offline dedup divergence, documented rather
    than hidden.

    Exactly-once: an ``_epoch_N`` marker makes a retried epoch a no-op
    (foreachBatch replays epochs on failure). Production points the
    same logic at a transactional lake table (Delta/Iceberg MERGE);
    plain parquet append + marker is the lakehouse-less emulation.

    Scale: all joins carry ids/digests/band keys; lake text is touched
    only for candidate-adjacent docs (semi-join pruned inside
    verify_candidates_jaccard); the bands/ index grows one row per
    (kept doc × band) and is the only lake-side input to candidate
    generation. Hot boilerplate band keys inherit the capped-LSH
    review-queue option of the underlying operators.
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.8,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 2,
        max_bucket_size: int | None = None,
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        #: 100 TB control loop: cap the per-band-key join fan-out. The
        #: LAKE side of the cross-batch join accumulates every kept
        #: doc's band rows forever, so one boilerplate band key
        #: eventually matches millions of lake rows — the same hot-
        #: bucket quadratic the batch operators cap count-first.
        #: With a cap set, over-cap lake keys skip the auto join and
        #: surface as (band_id, band_hash, n_members) rows under
        #: ``review/`` — the deferred-work channel; within-batch
        #: candidate generation gets the same cap via
        #: minhash_lsh_candidates(max_bucket_size=...).
        self.max_bucket_size = max_bucket_size

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.apply_batch(batch_df, epoch_id)

    def _read_or_none(self, spark, sub: str) -> DataFrame | None:
        try:
            return spark.read.parquet(f"{self.path}/{sub}")
        except Exception:
            return None

    def apply_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        import os

        from ..operators import dedup as D
        from ..operators.materialize import materialize_once

        marker = f"{self.path}/_epoch_{epoch_id}"
        if os.path.exists(marker):
            return  # retried epoch — already applied
        spark = batch_df.sparkSession
        id_c, txt = self.id_col, self.text_col

        # 1. exact layer: lake digests then min-id within batch
        batch = batch_df.withColumn("__digest", F.md5(F.col(txt)))
        kept = self._read_or_none(spark, "kept")
        if kept is not None:
            batch = batch.join(
                kept.select("__digest").distinct(), "__digest", "left_anti"
            )
        first = batch.groupBy("__digest").agg(F.min(id_c).alias(id_c))
        batch = batch.join(first, ["__digest", id_c], "semi")

        # 2. cross-batch near-dup vs the lake band index
        lake_bands = self._read_or_none(spark, "bands")
        if lake_bands is not None and kept is not None:
            if self.max_bucket_size is not None:
                # count-first cap on the LAKE side of the join: sizes
                # from a skew-immune count agg, over-cap keys routed to
                # the review/ queue BEFORE any join fan-out exists
                key_counts = lake_bands.groupBy("band_id", "band_hash").agg(
                    F.count(F.lit(1)).alias("n_members")
                )
                key_counts.filter(
                    F.col("n_members") > self.max_bucket_size
                ).write.mode("append").parquet(f"{self.path}/review")
                lake_bands = lake_bands.join(
                    key_counts.filter(
                        F.col("n_members") <= self.max_bucket_size
                    ).select("band_id", "band_hash"),
                    ["band_id", "band_hash"],
                )
            batch_bands = D._lsh_band_rows(
                batch, id_c, txt, self.num_hashes, self.bands, self.shingle_n,
                portable=True,
            )
            cross = (
                lake_bands.withColumnRenamed(id_c, "id_a")
                .join(
                    batch_bands.withColumnRenamed(id_c, "id_b"),
                    ["band_id", "band_hash"],
                )
                .select("id_a", "id_b")
                .distinct()
            )
            docs_for_verify = kept.select(id_c, txt).unionByName(
                batch.select(id_c, txt)
            )
            matched = (
                D.verify_candidates_jaccard(
                    docs_for_verify, cross, id_c, txt, self.threshold, self.shingle_n
                )
                .select(F.col("id_b").alias(id_c))
                .distinct()
            )
            batch = batch.join(matched, id_c, "left_anti")

        # 3. within-batch near-dup: bounded LSH + star-CC, min-id reps
        cands = D.minhash_lsh_candidates(
            batch, id_c, txt, self.num_hashes, self.bands, self.shingle_n,
            max_bucket_size=self.max_bucket_size, portable=True,
        )
        pairs = D.verify_candidates_jaccard(
            batch, cands, id_c, txt, self.threshold, self.shingle_n
        )
        clusters = D.connected_components_star(pairs)
        drop = clusters.filter(F.col("cluster_id") != F.col("id")).select("id")
        survivors = batch.join(
            F.broadcast(drop), F.col(id_c) == F.col("id"), "left_anti"
        )

        # 4. commit: kept docs + their band-row index, then the marker
        survivors = materialize_once(survivors)
        survivors.write.mode("append").parquet(f"{self.path}/kept")
        D._lsh_band_rows(
            survivors, id_c, txt, self.num_hashes, self.bands, self.shingle_n,
            portable=True,
        ).write.mode("append").parquet(f"{self.path}/bands")
        os.makedirs(self.path, exist_ok=True)
        open(marker, "w").close()

    def read_kept(self, spark) -> DataFrame:
        return spark.read.parquet(f"{self.path}/kept").drop("__digest")
