"""Write path (routed parquet, CDC snapshot sink) + the demo CLI."""

from __future__ import annotations

import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.sources.mock_server import MockMaxScaleServer
from gomaxscale_spark.streaming.sinks import CDCSnapshotSink, write_routed


def test_write_routed_partitions_by_event_type(spark, sf_dir, tmp_path):
    path = str(tmp_path / "routed")
    df = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    write_routed(df, path)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    import os

    kinds = {d.split("=")[1] for d in os.listdir(path) if d.startswith("event_type=")}
    assert kinds == {"click", "view", "purchase", "signup", "error"}
    # partition pruning: a route filter reads one directory
    one = back.filter(F.col("event_type") == "click")
    assert "click" in one._jdf.queryExecution().executedPlan().toString() or one.count() > 0


def test_cdc_snapshot_sink_incremental(spark, tmp_path):
    path = str(tmp_path / "snap")
    sink = CDCSnapshotSink(path, key_cols=["id"], order_cols=["seq", "event_number"])

    b1 = spark.createDataFrame(
        [
            (1, "insert", 10.0, 100, 1),
            (2, "insert", 20.0, 101, 1),
            (3, "insert", 30.0, 102, 1),
        ],
        "id int, event_type string, v double, seq long, event_number int",
    )
    sink.apply_batch(b1)
    state = {r.id: r.v for r in sink.read_snapshot(spark).collect()}
    assert state == {1: 10.0, 2: 20.0, 3: 30.0}

    b2 = spark.createDataFrame(
        [
            (1, "update_before", 10.0, 200, 1),
            (1, "update_after", 11.0, 200, 2),
            (2, "delete", 20.0, 201, 1),
            (4, "insert", 40.0, 202, 1),
        ],
        "id int, event_type string, v double, seq long, event_number int",
    )
    sink.apply_batch(b2)
    state = {r.id: r.v for r in sink.read_snapshot(spark).collect()}
    assert state == {1: 11.0, 3: 30.0, 4: 40.0}  # updated, deleted, kept, inserted


def test_cdc_snapshot_sink_as_stream_target(spark, tmp_path):
    """foreachBatch wiring end-to-end over a rate-limited memory stream."""
    import time

    path = str(tmp_path / "snap_stream")
    sink = CDCSnapshotSink(path, key_cols=["id"], order_cols=["seq"])
    src_path = str(tmp_path / "changes")
    changes = spark.createDataFrame(
        [(i % 5, "insert", float(i), i) for i in range(50)],
        "id int, event_type string, v double, seq long",
    )
    changes.repartition(4).write.mode("overwrite").parquet(src_path)
    stream = spark.readStream.schema(changes.schema).option("maxFilesPerTrigger", 1).parquet(src_path)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    time.sleep(0.2)
    snap = {r.id: r.v for r in sink.read_snapshot(spark).collect()}
    # latest seq per key wins: ids 0..4, seq 45..49 → v 45.0..49.0
    assert snap == {i: float(45 + i) for i in range(5)}


DML = {
    "domain": 0,
    "server_id": 1,
    "sequence": 1,
    "event_number": 1,
    "timestamp": 1704067200,
    "event_type": "insert",
    "id": 7,
}


@pytest.mark.slow
def test_cli_once_mode_prints_events():
    with MockMaxScaleServer(script=[DML, dict(DML, sequence=2)]) as (host, port):
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "gomaxscale_spark.cli",
                "--host", host,
                "--port", str(port),
                "--database", "example",
                "--table", "users",
                "--user", "u",
                "--password", "p",
                "--read-timeout", "0.2",
                "--once",
                "--cpus", "2",
            ],
            capture_output=True,
            text=True,
            timeout=180,
        )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[dml] seq=1" in proc.stdout
    assert "[dml] seq=2" in proc.stdout


def test_cli_requires_database_and_table():
    from gomaxscale_spark.cli import main

    assert main(["--host", "x"]) == 2


def test_cdc_snapshot_sink_idempotent_replay(spark, tmp_path):
    """foreachBatch may re-run a batch after failure; the latest-wins
    fold of (current ∪ batch) makes re-application a no-op — the
    exactly-once story for the sink side."""
    path = str(tmp_path / "snap_idem")
    sink = CDCSnapshotSink(path, key_cols=["id"], order_cols=["seq"])
    batch = spark.createDataFrame(
        [(1, "insert", 1.0, 10), (2, "insert", 2.0, 11), (1, "delete", 1.0, 12)],
        "id int, event_type string, v double, seq long",
    )
    sink.apply_batch(batch)
    state1 = sorted((r.id, r.v) for r in sink.read_snapshot(spark).collect())
    sink.apply_batch(batch)  # replay the exact same epoch
    state2 = sorted((r.id, r.v) for r in sink.read_snapshot(spark).collect())
    assert state1 == state2 == [(2, 2.0)]


@pytest.mark.slow
def test_cli_streaming_mode_prints_stats():
    """The default streaming mode: console sink + per-batch stats lines
    (the reference's WithStats output, gomaxscale_test.go:296-297)."""
    script = [dict(DML, sequence=i) for i in range(1, 6)]
    # generous keep_open/duration: the subprocess boots a second JVM,
    # which can take >10 s when the host is loaded (full-suite runs)
    with MockMaxScaleServer(script=script, write_delay=0.1, keep_open=25.0) as (host, port):
        proc = subprocess.run(
            [
                sys.executable, "-m", "gomaxscale_spark.cli",
                "--host", host, "--port", str(port),
                "--database", "example", "--table", "users",
                "--user", "u", "--password", "p",
                "--read-timeout", "0.2",
                "--duration", "28",
                "--cpus", "2",
            ],
            capture_output=True,
            text=True,
            timeout=240,
        )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # console sink batches reached stdout; stats lines reached stderr
    assert "Batch:" in proc.stdout
    assert "events/second" in proc.stderr
