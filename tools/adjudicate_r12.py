#!/usr/bin/env python
"""Round-12 adjudication (VERDICT r11 mandates #4 + #5).

#4: standing isolated best-of-5 for flagged entries — default target is
`dedup_minhash_lsh_capped` (the one r11 flag that recovered only
normalized, owed a settled-host re-check); pass further names as CLI
args when the r12 driver battery flags more.

#5: the throughput-canary flag lines are now COMPUTED here, not prose.
The r8 flag lines (CDC >= ~230k ev/s, capstone in its post-word_shingles
band) were set when the calibration probe's host floor read ~0.145 s;
this host drifts 1.3-1.8x. Normalization direction matters and the
COVERAGE r11 prose wrote it inverted — the arithmetic it actually did
(224,942 ev/s at calibration 0.193 -> ~300k normalized) is:

    normalized_throughput = raw_best * (session_calibration_best / REF_CAL)

(a slower host depresses raw throughput, so scaling UP by the host's
slowdown recovers the reference-host estimate; WALL times normalize
with the inverse factor). This tool prints PASS/FLAG per canary from
that formula so the check is mechanical, plus a `settled` bit
(calibration < 0.15 = the host state the r10 lines were set in, i.e.
raw readings are directly comparable).
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

#: calibration best on the host state where the canary flag lines were
#: set (r10 close: 0.139-0.148; the lines quote 0.145)
REF_CAL = 0.145
CDC_FLAG_EVS = 230_000.0
#: capstone floor = the r10 post-word_shingles band's low edge
#: (2,875 docs/s in-battery r10; isolated bests since: 3,280-3,326)
CAPSTONE_FLAG_DOCS = 2_875.0

DEFAULT_TARGETS = ("dedup_minhash_lsh_capped",)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    targets = tuple(sys.argv[1:]) or DEFAULT_TARGETS
    spark = get_session("gomaxscale_spark_adjudicate_r12")
    registry = all_queries()

    materialize(registry["scan_filter_project"].fn(spark, sf_dir))

    def calibrate() -> list[float]:
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(registry["scan_filter_project"].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        return runs

    # pre AND post (like bench.py, r12 fix): this host reproducibly
    # settles ~1.8× over the first minutes of a battery, so a tool
    # that calibrates only up front systematically reads "slow host"
    # while its TARGETS run in the settled phase — the tighter bound
    # is the honest host estimate.
    calib_pre = calibrate()
    out: dict[str, object] = {}

    target_runs: dict[str, list[float]] = {}
    for name in targets:
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(registry[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        target_runs[name] = runs

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cap = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(registry["pipeline_training_corpus"].fn(spark, sf_dir))
        cap.append(time.perf_counter() - t0)

    import bench as B  # repo-root bench: the reference's own canary

    ev = [B.cdc_ingest_events_per_sec() for _ in range(5)]

    calib_post = calibrate()
    cal_best = min(calib_pre + calib_post)
    host = cal_best / REF_CAL
    out["calibration"] = {
        "best": round(cal_best, 3),
        "pre": round(min(calib_pre), 3),
        "post": round(min(calib_post), 3),
        "ref": REF_CAL,
        "host_slowdown": round(host, 2),
        "settled": cal_best < 0.15,
    }
    for name, runs in target_runs.items():
        out[name] = {
            "best": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
            # walls normalize DOWN on a slow host
            "best_normalized": round(min(runs) / host, 3),
        }
    cap_best = n_docs / min(cap)
    cap_norm = cap_best * host  # throughput normalizes UP on a slow host
    out["capstone_docs_per_sec"] = {
        "best": round(cap_best, 0),
        "median": round(n_docs / statistics.median(cap), 0),
        "normalized": round(cap_norm, 0),
        "flag_line": CAPSTONE_FLAG_DOCS,
        "verdict": "PASS" if cap_norm >= CAPSTONE_FLAG_DOCS else "FLAG",
    }
    ev_best = max(ev)
    ev_norm = ev_best * host
    out["cdc_ingest_events_per_sec"] = {
        "best": round(ev_best, 0),
        "median": round(statistics.median(ev), 0),
        "normalized": round(ev_norm, 0),
        "flag_line": CDC_FLAG_EVS,
        "verdict": "PASS" if ev_norm >= CDC_FLAG_EVS else "FLAG",
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
