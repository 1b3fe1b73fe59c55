#!/usr/bin/env python
"""Round-11 adjudication (VERDICT r10 mandate #2): isolated best-of-5
for the entries the r10 DRIVER battery read slower than r9 under its
own 1.7x settling pre/post calibration drift — dedup_simhash (x1.24),
range_join_bucketed (x1.33), dedup_embedding_cosine (x1.24),
window_zscore_builtin (x1.21), text_tfidf (x1.18). Standing protocol
(COVERAGE.md, held r6-r10): best-of-5 on the idle host, NO concurrent
Spark; recover to the prior band -> in-battery/host noise, else
profile. Note on dedup_simhash: the verdict suspected the r10
word_shingles rewrite, but simhash_signatures never calls
word_shingles (it explodes raw tokens); tools/ab_simhash_plan.py
proves the executed plan is byte-identical under old-vs-new
word_shingles, so best-of-5 noise adjudication IS the right
instrument after all.

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
    "dedup_simhash",
    "range_join_bucketed",
    "dedup_embedding_cosine",
    "window_zscore_builtin",
    "text_tfidf",
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("gomaxscale_spark_adjudicate_r11")
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
