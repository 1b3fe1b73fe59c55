#!/usr/bin/env python
"""Round-10 close adjudication: isolated best-of-5 for the entries the
close-note bench flagged SLOWER than the r9 driver medians, on a
battery whose PRE-calibration read 1.5-1.7x the POST (host not at
steady state when the battery started — the same environmental drift
session 1 measured at 2.2-2.3x). Standing protocol (COVERAGE.md,
held r6-r9): best-of-5 on the idle host, NO concurrent Spark; recover
to the prior band → in-battery/host noise, else profile.

Prints one JSON line: calibration best/median + per-target best/median
+ the two throughput canaries.
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

TARGETS = (
    "similarity_ivf_topk_scaled",
    "sampling_domain_cap_salted",
    "similarity_cosine_topk_batch",
    "cdc_scd2_history",
    "dedup_minhash_lsh_hot_drain",
    "similarity_lsh_bucketed_scaled",
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("gomaxscale_spark_adjudicate_r10")
    registry = all_queries()

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

    for name in TARGETS:
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        out[name] = {
            "best": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
        }

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cap = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(registry["pipeline_training_corpus"].fn(spark, sf_dir))
        cap.append(time.perf_counter() - t0)
    out["capstone_docs_per_sec"] = {
        "best": round(n_docs / min(cap), 0),
        "median": round(n_docs / statistics.median(cap), 0),
    }

    import bench as B  # repo-root bench: the reference's own canary

    ev = [B.cdc_ingest_events_per_sec() for _ in range(5)]
    out["cdc_ingest_events_per_sec"] = {
        "best": round(max(ev), 0),
        "median": round(statistics.median(ev), 0),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
