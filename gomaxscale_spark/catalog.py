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

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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


def event_ts_as_timestamp(df: DataFrame) -> DataFrame:
    """Normalize the physical `ts` column to a µs TimestampType.

    The driver's events parquet has shipped with two physical encodings:
    TIMESTAMP(NANOS) (which Spark reads as a long via nanosAsLong) and
    native TIMESTAMP(MICROS) (which Spark 4 reads as TIMESTAMP_NTZ).
    Both represent the same UTC wall-clock; with the session TZ pinned to
    UTC the NTZ→TZ cast is instant-preserving, so downstream plans see one
    stable TimestampType either way.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # integer div, not `/1000` — double division rounds the µs
        # at 1e18-scale nanos (off-by-one vs the oracle's truncation)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # expose BOTH: ts TIMESTAMP (µs) and ts_ns BIGINT exact nanos
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
            )
        else:
            df = event_ts_as_timestamp(df).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
        df = df.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view for the SQL API."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
