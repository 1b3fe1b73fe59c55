"""Bucketed-table utilities: pre-shuffle once at write time, join free
forever after.

The single biggest shuffle eliminator at 100 TB: a fact table bucketed
on its join key co-locates equal keys in equal bucket files, so a join
between two tables bucketed on the same key with the same bucket count
needs NO exchange at read time — the sort-merge join runs directly over
matching buckets. This is the batch analogue of the CDC snapshot sink's
hash-bucketed layout (streaming/sinks.py).

Spark bucketing rides the session catalog (`saveAsTable`), so these
helpers manage warehouse tables, not bare paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parallelize_narrow_input(df: DataFrame) -> DataFrame:
    """Repartition iff the input has fewer partitions than cores.

    Single-row-group parquet files (this repo's test data) scan as ONE
    task, serializing heavy map work (shingling, 64 hash functions,
    per-pair scoring after a broadcast join) on one core. The guard
    makes this a no-op on properly-partitioned lake inputs, so no
    gratuitous shuffle at scale; when it fires, the shuffle moves only
    the narrow input rows — never post-join expanded pairs — and buys
    full map-side parallelism.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Persist `df` bucketed (and sorted) by `bucket_col`.

    Scale: one shuffle now; every future equi-join/aggregation on
    `bucket_col` between same-bucketed tables skips its exchange (and
    with sorted buckets, its sort).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plan shows SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
