#!/usr/bin/env python
"""Round-9 adjudication: isolated best-of-5 for the three r8 bench
outliers flagged on git-untouched code (VERDICT r8 "What's wrong" #1)
plus the CDC ingest canary.

Standing noise protocol (COVERAGE.md, held r6-r8): a flagged-SLOWER
query whose code didn't change gets a best-of-5 on the idle host with
NO concurrent Spark work; if it recovers to the prior round's band the
flag is recorded as in-battery noise, else it gets profiled.

Prints one JSON line with best + median of 5 per target.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("gomaxscale_spark_adjudicate_r9")
    registry = all_queries()

    # warm JVM/codegen on the calibration probe, and record it so the
    # isolated numbers can be host-normalized against BENCH_r08's
    # calibration row (0.162 min / 0.166 median)
    materialize(registry["scan_filter_project"].fn(spark, sf_dir))
    calib = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(registry["scan_filter_project"].fn(spark, sf_dir))
        calib.append(time.perf_counter() - t0)

    out: dict[str, dict] = {
        "calibration": {
            "best": round(min(calib), 3),
            "median": round(statistics.median(calib), 3),
        }
    }

    for name in ("text_quality_score", "multimodal_frame_extract"):
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "best": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
            "runs": [round(r, 3) for r in runs],
        }

    # capstone throughput, best-of-5 (bench uses best-of-2)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cap_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(registry["pipeline_training_corpus"].fn(spark, sf_dir))
        cap_runs.append(time.perf_counter() - t0)
    out["capstone"] = {
        "best_sec": round(min(cap_runs), 3),
        "docs_per_sec_best": round(n_docs / min(cap_runs), 0),
        "docs_per_sec_median": round(n_docs / statistics.median(cap_runs), 0),
    }

    spark.stop()

    # CDC canary after Spark is down: pure-Python socket path, no JVM
    from bench import cdc_ingest_events_per_sec

    canary = [cdc_ingest_events_per_sec() for _ in range(5)]
    out["cdc_ingest_events_per_sec"] = {
        "best": max(canary),
        "median": statistics.median(canary),
    }

    print("ADJUDICATE_R9 " + json.dumps(out))


if __name__ == "__main__":
    main()
