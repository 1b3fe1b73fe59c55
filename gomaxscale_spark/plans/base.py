"""Query registry plumbing.

Each query is registered with an optional DuckDB oracle-SQL twin. The
contract (driver, __spark_entry__.py): identical column names both
sides; driver sorts columns by name and value-hashes order-insensitively.

Float discipline: every column produced by arithmetic is rounded (2dp
money, 6dp scores) *identically on both sides*; columns passed through
unchanged are left exact. Sub-second timestamps never appear raw —
``events.ts`` is nanosecond-precision parquet and Spark is µs — outputs
use ``ts_ns`` (exact long), truncated timestamps, or epoch micros.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
