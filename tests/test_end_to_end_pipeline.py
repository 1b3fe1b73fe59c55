"""The reference's canonical lab scenario (README.md docker-compose
example.users) end-to-end on this engine: a MaxScale mock streams a DDL
event and a mixed insert/update/delete changelog; a streaming query
consumes it through the `maxscale_cdc` source, projects typed columns
via the DDL-derived registry schema, and maintains a materialized
snapshot with the CDC sink. The final snapshot must equal the table
state a sequential replay produces."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.sources.cdc_source import MaxScaleCDCDataSource
from gomaxscale_spark.sources.mock_server import MockMaxScaleServer
from gomaxscale_spark.sources.schema_registry import SchemaRegistry
from gomaxscale_spark.streaming.sinks import CDCSnapshotSink

DDL = {
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "table": "users",
    "database": "example",
    "version": 1,
    "gtid": "0-1-0",
    "fields": [
        {"name": "id", "type": "int", "real_type": "int"},
        {"name": "name", "type": ["null", "string"], "real_type": "varchar", "length": 255},
        {"name": "state", "type": {"type": "enum", "name": "state", "symbols": ["active", "blocked"]}},
    ],
}


def ev(seq, num, etype, **cols):
    row = {
        "domain": 0,
        "server_id": 1,
        "sequence": seq,
        "event_number": num,
        "timestamp": 1704067200 + seq,
        "event_type": etype,
    }
    row.update(cols)
    return row


CHANGELOG = [
    DDL,
    ev(1, 1, "insert", id=1, name="alice", state="active"),
    ev(2, 1, "insert", id=2, name="bob", state="active"),
    ev(3, 1, "insert", id=3, name="carol", state="blocked"),
    # alice renamed
    ev(4, 1, "update_before", id=1, name="alice", state="active"),
    ev(4, 2, "update_after", id=1, name="alice2", state="active"),
    # bob deleted
    ev(5, 1, "delete", id=2, name="bob", state="active"),
    # carol unblocked
    ev(6, 1, "update_before", id=3, name="carol", state="blocked"),
    ev(6, 2, "update_after", id=3, name="carol", state="active"),
    # dave arrives with no name (nullable union)
    ev(7, 1, "insert", id=4, name=None, state="active"),
]

EXPECTED = {
    1: ("alice2", "active"),
    3: ("carol", "active"),
    4: (None, "active"),
}


def test_full_cdc_pipeline_to_snapshot(spark, tmp_path):
    spark.dataSource.register(MaxScaleCDCDataSource)
    snap_path = str(tmp_path / "users_snapshot")

    with MockMaxScaleServer(script=CHANGELOG, write_delay=0.05, keep_open=4.0) as (host, port):
        stream = (
            spark.readStream.format("maxscale_cdc")
            .options(
                host=host,
                port=str(port),
                database="example",
                table="users",
                user="maxuser",
                password="maxpwd",
                read_timeout="0.2",
            )
            .load()
        )

        registry = SchemaRegistry()
        registry.register(DDL)  # in production fed from the ddl route
        typed_schema = registry.full_dml_schema("example", "users")
        sink = CDCSnapshotSink(
            snap_path, key_cols=["id"], order_cols=["sequence", "event_number"]
        )

        def apply(batch_df, epoch_id):
            typed = (
                batch_df.filter(F.col("kind") == "dml")
                .select(F.from_json("raw", typed_schema).alias("r"))
                .select("r.*")
            )
            if typed.take(1):
                sink.apply_batch(typed)

        q = (
            stream.writeStream.foreachBatch(apply)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 30
        state = {}
        while time.time() < deadline:
            try:
                state = {
                    r.id: (r.name, r.state) for r in sink.read_snapshot(spark).collect()
                }
                if state == EXPECTED:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()

    assert state == EXPECTED

    # enum domain check (C-layer): every surviving state value ∈ symbols
    from gomaxscale_spark.sources.schema_registry import enum_domain_check

    snap = sink.read_snapshot(spark)
    symbols = typed_schema["state"].metadata["enum_symbols"]
    n_bad = snap.filter(~enum_domain_check("state", symbols)).count()
    assert n_bad == 0


DDL_V2 = dict(
    DDL,
    version=2,
    gtid="0-1-8",
    fields=DDL["fields"] + [{"name": "age", "type": ["null", "int"], "real_type": "int"}],
)


def test_schema_evolution_mid_stream(spark, tmp_path):
    """C4: a version-2 DDL arrives mid-stream (ALTER TABLE added a
    column); rows before and after parse against their own schema
    version and merge with unionByName — the registry-driven evolution
    path (reference types.go:36, gomaxscale_options.go:84-88)."""
    spark.dataSource.register(MaxScaleCDCDataSource)
    changelog = [
        DDL,
        ev(1, 1, "insert", id=1, name="alice", state="active"),
        DDL_V2,
        ev(9, 1, "insert", id=5, name="eve", state="active", age=30),
    ]
    with MockMaxScaleServer(script=changelog, keep_open=1.0) as (host, port):
        df = (
            spark.read.format("maxscale_cdc")
            .options(
                host=host, port=str(port), database="example", table="users",
                user="u", password="p", read_timeout="0.2", max_idle_polls="3",
            )
            .load()
        )
        rows = df.collect()

    registry = SchemaRegistry()
    for r in rows:
        if r.kind == "ddl":
            registry.register(r.raw)
    assert registry.versions("example", "users") == [1, 2]

    dml_df = spark.createDataFrame(
        [(r.raw,) for r in rows if r.kind == "dml"], "raw string"
    )
    v1 = dml_df.select(
        F.from_json("raw", registry.full_dml_schema("example", "users", version=1)).alias("r")
    ).select("r.*").filter(F.col("sequence") < 9)
    v2 = dml_df.select(
        F.from_json("raw", registry.full_dml_schema("example", "users", version=2)).alias("r")
    ).select("r.*").filter(F.col("sequence") >= 9)
    merged = v1.unionByName(v2, allowMissingColumns=True)

    got = {r.id: (r.name, r.age if "age" in merged.columns else None) for r in merged.collect()}
    assert got == {1: ("alice", None), 5: ("eve", 30)}
