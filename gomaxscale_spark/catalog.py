"""Table catalog over the driver-generated parquet test data.

Loads the TPC-H-ish star schema + the stream/LLM tables
(``TESTDATA.md``) and normalizes the one awkward physical detail: the
``events.ts`` column is nanosecond-precision parquet, which Spark reads as
a long (see session.RUNTIME_CONFS). We expose BOTH:

- ``ts``     TIMESTAMP  — truncated to microseconds (Spark's native
  precision); use for windowing / date_trunc, where both engines floor.
- ``ts_ns``  BIGINT     — the exact nanosecond value; use wherever exact
  event ordering matters (CDC offset-style ordering, as-of joins).

Scale: `spark.read.parquet` gives Catalyst full pushdown (PushedFilters /
ReadSchema pruning) and partition-parallel scans. At 100 TB the same call
reads a partitioned/ bucketed lake layout; nothing here materializes or
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast in joins (a few KB..MB even at
#: TPC-H SF100k; region=5 rows, nation=25 rows at every SF).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos → exact long + µs timestamp (session TZ pinned to UTC).
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            # integer div, not `/1000` — double division rounds the µs
            # at 1e18-scale nanos (off-by-one vs the oracle's truncation)
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view for the SQL API."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
