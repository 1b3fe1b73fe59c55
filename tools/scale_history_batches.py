#!/usr/bin/env python
"""Batch-cost study for the streaming SCD2 sink (CDCHistorySink).

Two workload shapes, because the design's cost model is honest about
having a win case and a worst case:

- NARROW batches (a handful of keys — the common CDC shape): cost is
  O(touched buckets' log), so per-batch wall should stay FLAT as the
  table grows. This is what the bucket scoping buys.
- UNIFORM batches (every batch touches every bucket): the rebuild
  refolds the whole accepted-event log — per-batch wall should RAMP
  with table size. That is inherent to a non-associative fold over
  plain parquet (intervals need each key's full event set); the
  production answer at 100 TB is MERGE into a transactional table,
  and n_buckets only helps when batches are narrow.

Usage:
  python tools/scale_history_batches.py [sf_dir] [k_uniform] [k_narrow]
Prints one JSON line per series; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.session import get_session
from gomaxscale_spark.streaming.sinks import CDCHistorySink


def deciles(walls: list[float]) -> list[float]:
    d = max(1, len(walls) // 10)
    return [
        round(sum(walls[i : i + d]) / len(walls[i : i + d]), 3)
        for i in range(0, len(walls) - len(walls) % d, d)
    ]


def run(sf_dir: str, k_uniform: int, k_narrow: int,
        rebuild_scope: str = "keys", spark=None) -> None:
    spark = spark or get_session("history_batch_study")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("id"),
            F.col("event_type"),
            F.col("value").alias("v"),
            F.expr("ts_ns div 1000").alias("ts_us"),
            "event_id",
        )
        .withColumn(
            "op",
            F.when(F.col("event_type") == "error", "delete").otherwise("insert"),
        )
        .drop("event_type")
    )
    n = ev.count()

    # UNIFORM: k equal chronological slices; every batch touches every bucket
    path = f"/tmp/hist_study_uniform_{rebuild_scope}"
    shutil.rmtree(path, ignore_errors=True)
    sink = CDCHistorySink(path, key_cols=["id"], order_cols=["ts_us", "event_id"],
                          event_type_col="op", rebuild_scope=rebuild_scope)
    fracs = ",".join(str((i + 1) / k_uniform) for i in range(k_uniform))
    bounds = [int(x) for x in ev.select(F.expr(f"percentile(ts_us, array({fracs}))")).head()[0]]
    walls = []
    lo = None
    for e, hi in enumerate(bounds):
        b = ev.filter(F.col("ts_us") <= hi)
        if lo is not None:
            b = b.filter(F.col("ts_us") > lo)
        lo = hi
        t0 = time.perf_counter()
        sink.apply_batch(b, e)
        walls.append(time.perf_counter() - t0)
    dec = deciles(walls)
    print(json.dumps({
        "series": "uniform", "scope": rebuild_scope, "k": k_uniform, "events": n,
        "per_batch_mean_s": round(sum(walls) / len(walls), 3),
        "decile_means_s": dec,
        "ramp_last_over_first": round(dec[-1] / dec[0], 2),
    }), flush=True)

    # NARROW: k 1-key batches against the now-large table
    one_key = ev.select("id").distinct().orderBy("id").limit(1).head()[0]
    walls2 = []
    for e in range(k_narrow):
        b = spark.createDataFrame(
            [(int(one_key), float(e), 10_000_000_000 + e, e, "insert")],
            "id int, v double, ts_us long, event_id long, op string",
        )
        t0 = time.perf_counter()
        sink.apply_batch(b, k_uniform + e)
        walls2.append(time.perf_counter() - t0)
    dec2 = deciles(walls2)
    print(json.dumps({
        "series": "narrow_1key", "scope": rebuild_scope, "k": k_narrow,
        "per_batch_mean_s": round(sum(walls2) / len(walls2), 3),
        "decile_means_s": dec2,
    }), flush=True)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/events_x10"
    k_u = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scopes = (sys.argv[4].split(",") if len(sys.argv) > 4 else ["keys", "bucket"])
    spark = get_session("history_batch_study")
    for scope in scopes:
        run(sf_dir, k_u, k_n, rebuild_scope=scope, spark=spark)
    if len(scopes) >= 2:
        a = spark.read.parquet(f"/tmp/hist_study_uniform_{scopes[0]}/history")
        for other in scopes[1:]:
            b = spark.read.parquet(f"/tmp/hist_study_uniform_{other}/history")
            same = (a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty())
            print(json.dumps({"series": "mode_equality",
                              "modes": [scopes[0], other],
                              "identical": bool(same),
                              "rows": a.count()}), flush=True)
