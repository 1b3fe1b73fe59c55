"""Local replica of the driver's correctness gate: run a catalog query
on Spark and its oracle SQL on DuckDB over the same parquet, then
compare row count + column names + order-insensitive values.

Used by tests/test_oracle_parity.py (sf0.001) so oracle mismatches are
caught before the driver runs the real gate at sf0.01.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from .catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int,)):
        return str(int(v))
    try:
        import numpy as np

        if isinstance(v, np.floating):
            f = float(v)
            return "NULL" if math.isnan(f) else repr(f)
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.bool_):
            return str(bool(v))
        if isinstance(v, np.datetime64):
            return pd.Timestamp(v).isoformat()
        if isinstance(v, np.ndarray):  # Spark array columns via toPandas
            return "[" + ",".join(_norm_value(x) for x in v.tolist()) + "]"
    except Exception:
        pass
    if isinstance(v, list):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    scols, srows = normalize(spark_pdf)
    ocols, orows = normalize(oracle_pdf)
    if scols != ocols:
        problems.append(f"column mismatch: spark={scols} oracle={ocols}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count mismatch: spark={len(srows)} oracle={len(orows)}")
    n_diff = 0
    for sr, orow in zip(srows, orows):
        if sr != orow:
            n_diff += 1
            if n_diff <= 5:
                diff_cols = [
                    f"{c}: spark={a!r} oracle={b!r}"
                    for c, a, b in zip(scols, sr, orow)
                    if a != b
                ]
                problems.append("row diff — " + "; ".join(diff_cols))
    if n_diff > 5:
        problems.append(f"... {n_diff} differing rows total of {len(srows)}")
    return problems
