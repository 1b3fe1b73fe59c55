#!/usr/bin/env python
"""A/B the capstone's materialization strategy (VERDICT r5 item 2).

Runs pipeline_training_corpus at $SPARK_GRAFT_SF_DIR under each
SPARK_GRAFT_MATERIALIZE mode, N runs per mode interleaved round-robin
(so host noise hits all modes equally), and reports min/median. Also
prints whether the no-materialization executed plan contains a
ReusedExchange over the shared dedup subtree.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.operators import materialize as MAT
from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_RUNS", "5"))
    spark = get_session("ab_capstone")
    fn = all_queries()["pipeline_training_corpus"].fn
    modes = ["local_checkpoint", "persist_disk", "none"]
    times: dict[str, list[float]] = {m: [] for m in modes}

    # warm
    os.environ[MAT.ENV_VAR] = "none"
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for _ in range(n):
        for m in modes:
            os.environ[MAT.ENV_VAR] = m
            spark.catalog.clearCache()
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[m].append(time.perf_counter() - start)

    for m in modes:
        ts = times[m]
        print(
            f"{m:18s} min={min(ts):.3f} median={statistics.median(ts):.3f} "
            f"all={[round(x, 3) for x in ts]}"
        )

    os.environ[MAT.ENV_VAR] = "none"
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    print("none-mode plan ReusedExchange:", "ReusedExchange" in plan)
    spark.stop()


if __name__ == "__main__":
    main()
