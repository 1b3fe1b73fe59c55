"""Multi-table CDC composition: one DataFrame over N subscriptions.

The reference (like the MaxScale CDC protocol itself) is strictly one
``database.table`` per connection — consuming several tables means
several consumers (gomaxscale.go:96-107). Spark's union composes them
declaratively: each subscription is its own `maxscale_cdc` source
(own socket, own GTID offset tracked independently in the checkpoint),
and the union presents a single stream tagged with the originating
table.

Scale: unions of streaming sources are planned as independent source
partitions — no shuffle is introduced; per-source rates are still
visible via the per-query StreamingQueryListener stats. Downstream
per-table routing is a filter (`source_table = 'db.t'`), which Catalyst
pushes into the union arms, or `partitionBy(source_table)` at the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_cdc_tables(
    spark: SparkSession,
    subscriptions: list[dict[str, str]],
    streaming: bool = True,
) -> DataFrame:
    """One DataFrame over N CDC subscriptions.

    Each dict is a full `maxscale_cdc` option set (host/port/database/
    table/...). Adds a ``source_table`` column (``database.table``) so
    downstream operators can route/partition per table.
    """
    if not subscriptions:
        raise ValueError("at least one subscription required")
    parts: list[DataFrame] = []
    for opts in subscriptions:
        reader = (
            spark.readStream if streaming else spark.read
        ).format("maxscale_cdc").options(**opts)
        df = reader.load().withColumn(
            "source_table",
            F.lit(f"{opts['database']}.{opts['table']}"),
        )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
