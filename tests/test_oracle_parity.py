"""Replica of the driver's t2 correctness gate at sf0.001.

For every catalog query with an oracle: run Spark + DuckDB, compare
row count / column names / order-insensitive values. Rows-only queries
just have to execute and return a sane DataFrame.
"""

from __future__ import annotations

import pytest

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.testing import compare_frames, duckdb_connection

QUERIES = all_queries()
WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = QUERIES[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(q.oracle).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
