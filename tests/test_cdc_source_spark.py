"""The `maxscale_cdc` data source driven through real Spark queries
(batch + Structured Streaming) against the mock server, plus the C3
typed-projection path (from_json with the registry schema)."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.sources.cdc_source import MaxScaleCDCDataSource
from gomaxscale_spark.sources.mock_server import MockMaxScaleServer
from gomaxscale_spark.sources.schema_registry import SchemaRegistry

DDL = {
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "table": "users",
    "database": "example",
    "version": 1,
    "gtid": "0-1-1",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": ["null", "string"]},
    ],
}


def dml(seq: int, **cols):
    row = {
        "domain": 0,
        "server_id": 1,
        "sequence": seq,
        "event_number": 1,
        "timestamp": 1704067200 + seq,
        "event_type": "insert",
    }
    row.update(cols)
    return row


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(MaxScaleCDCDataSource)
    return spark


def read_options(addr):
    host, port = addr
    return {
        "host": host,
        "port": str(port),
        "database": "example",
        "table": "users",
        "user": "maxuser",
        "password": "maxpwd",
        "read_timeout": "0.2",
        "max_idle_polls": "3",
    }


def test_batch_read(registered):
    script = [DDL] + [dml(i, id=i, name=f"u{i}") for i in range(5)]
    with MockMaxScaleServer(script=script) as addr:
        df = registered.read.format("maxscale_cdc").options(**read_options(addr)).load()
        rows = df.collect()
    kinds = sorted(r.kind for r in rows)
    assert kinds == ["ddl"] + ["dml"] * 5
    dml_rows = [r for r in rows if r.kind == "dml"]
    assert sorted(r.sequence for r in dml_rows) == list(range(5))
    assert all(r.raw for r in rows)


def test_batch_typed_projection_via_registry(registered):
    """C3: RawData → typed columns using the DDL-derived schema."""
    script = [DDL] + [dml(i, id=i, name=None if i % 2 else f"user-{i}") for i in range(4)]
    with MockMaxScaleServer(script=script) as addr:
        df = registered.read.format("maxscale_cdc").options(**read_options(addr)).load()
        ddl_raw = df.filter(F.col("kind") == "ddl").select("raw").head()[0]
        reg = SchemaRegistry()
        reg.register(ddl_raw)
        schema = reg.full_dml_schema("example", "users")
        typed = (
            df.filter(F.col("kind") == "dml")
            .select(F.from_json("raw", schema).alias("r"))
            .select("r.sequence", "r.id", "r.name")
        )
        out = {r.sequence: (r.id, r.name) for r in typed.collect()}
    assert out[0] == (0, "user-0")
    assert out[1] == (1, None)


def test_streaming_read_micro_batches(registered):
    script = [dml(i, id=i) for i in range(10)]
    with MockMaxScaleServer(script=script, write_delay=0.02) as addr:
        q = (
            registered.readStream.format("maxscale_cdc")
            .options(**read_options(addr))
            .load()
            .writeStream.format("memory")
            .queryName("cdc_stream_out")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 20
            while time.time() < deadline:
                n = registered.sql("SELECT count(*) FROM cdc_stream_out").head()[0]
                if n >= 10:
                    break
                time.sleep(0.3)
            out = registered.sql(
                "SELECT sequence FROM cdc_stream_out WHERE kind='dml' ORDER BY sequence"
            ).collect()
        finally:
            q.stop()
    assert [r.sequence for r in out] == list(range(10))


def test_streaming_offsets_track_gtid(registered):
    from gomaxscale_spark.sources.cdc_source import MaxScaleCDCStreamReader

    script = [dml(7, id=1), dml(9, id=2)]
    with MockMaxScaleServer(script=script) as addr:
        opts = read_options(addr)
        reader = MaxScaleCDCStreamReader(opts)
        start = reader.initialOffset()
        rows, end = reader.read(start)
        rows = list(rows)
        reader.stop()
    assert end["pos"] == len(rows) == 2
    assert end["gtid"] == "0-1-9"
