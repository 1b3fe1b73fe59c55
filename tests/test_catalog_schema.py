"""The events table has shipped with two physical `ts` encodings across
driver testdata generations: TIMESTAMP(NANOS) (Spark reads it as a long
via spark.sql.legacy.parquet.nanosAsLong) and native TIMESTAMP(MICROS)
(Spark 4 reads TIMESTAMP_NTZ). `catalog.load_table` must normalize both
to the same logical pair — ts TIMESTAMP (µs, UTC session) + ts_ns BIGINT
— so every downstream plan and oracle twin is encoding-agnostic.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import types as T

from gomaxscale_spark.catalog import load_table

ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 20, 30],
    "event_type": ["click", "view", "purchase"],
    "value": [1.5, 2.5, 3.5],
    "props": ["{}", "{}", "{}"],
}
# distinct µs values incl. one with sub-ms precision
TS_US = [1704067200_000000, 1704067200_123456, 1704153599_999999]


def _write_events(dirpath, ts_array):
    table = pa.table({**{k: pa.array(v) for k, v in ROWS.items()}, "ts": ts_array})
    # column order must match the real table
    table = table.select(["event_id", "ts", "user_id", "event_type", "value", "props"])
    pq.write_table(table, f"{dirpath}/events.parquet")
    return str(dirpath)


def test_load_table_normalizes_micros_timestamp(spark, tmp_path):
    d = tmp_path / "us"
    d.mkdir()
    _write_events(d, pa.array(TS_US, type=pa.timestamp("us")))
    df = load_table(spark, str(d), "events")
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props",
    ]
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert isinstance(df.schema["ts_ns"].dataType, T.LongType)
    got = {r["event_id"]: r["ts_ns"] for r in df.collect()}
    assert got == {i + 1: us * 1000 for i, us in enumerate(TS_US)}


def test_load_table_normalizes_nanos_long(spark, tmp_path):
    d = tmp_path / "ns"
    d.mkdir()
    _write_events(d, pa.array([us * 1000 + 7 for us in TS_US], type=pa.timestamp("ns")))
    df = load_table(spark, str(d), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {r["event_id"]: r["ts_ns"] for r in df.collect()}
    # exact nanos preserved (the +7 ns survives in ts_ns, truncated in ts)
    assert got == {i + 1: us * 1000 + 7 for i, us in enumerate(TS_US)}


def test_both_encodings_agree_on_ts_wall_clock(spark, tmp_path):
    d_us = tmp_path / "a"
    d_ns = tmp_path / "b"
    d_us.mkdir()
    d_ns.mkdir()
    _write_events(d_us, pa.array(TS_US, type=pa.timestamp("us")))
    _write_events(d_ns, pa.array([us * 1000 for us in TS_US], type=pa.timestamp("ns")))
    ts_us = [r["ts"] for r in load_table(spark, str(d_us), "events").orderBy("event_id").collect()]
    ts_ns = [r["ts"] for r in load_table(spark, str(d_ns), "events").orderBy("event_id").collect()]
    assert ts_us == ts_ns
