"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query on sf0.001 (smoke check).
- ``queries()``      — every implemented operator from SURVEY.md §2 as a
  ``(spark, sf_dir) -> DataFrame`` callable.
- ``oracle_sql()``   — DuckDB twin per query (omitted for genuinely
  non-SQL-expressible ops: LSH/SimHash candidates, HLL sketches,
  heuristic language-ID — those get the driver's rows-only check and
  are semantics-tested in tests/).

Implementation lives in the ``gomaxscale_spark`` package; this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.plans.cdc_stream import flagship_user_activity


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_user_activity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
