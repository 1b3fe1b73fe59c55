#!/usr/bin/env python
"""Per-query optimization probe (r16 optimization round).

For each named query (or the bench HEADLINE+EXTRA when none given),
measure separately:

- ``construct_s``: wall of calling ``registry[name].fn(spark, sf_dir)``
  — DataFrame/plan CONSTRUCTION (Py4J traffic + parser calls), a pure
  driver cost the bench cell nevertheless pays;
- ``first_s``: first noop materialize (codegen compile + execution);
- ``best_s`` / ``median_s``: best/median of ``--runs`` further
  materializes of a freshly constructed frame (steady-state cost);
- ``jobs``: Spark jobs launched by one materialize (barrier count —
  eager materialize_once/localCheckpoint calls show up here).

Usage: python tools/opt_probe.py [--sf DIR] [--runs N] [name ...]
Writes JSON lines to stdout; meant for an IDLE host.
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


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    registry = all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTRA)

    spark = get_session("opt_probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm JVM/codegen once
    registry["scan_filter_project"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        q = registry[name]
        sc.setJobDescription(f"opt_probe:{name}")
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        construct_s = time.perf_counter() - t0
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        first_s = time.perf_counter() - t0
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            # fresh construction per run: catalog fns may materialize
            # (localCheckpoint) during fn() or first use; re-building is
            # exactly what the bench times
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "name": name,
                    "construct_s": round(construct_s, 3),
                    "first_s": round(first_s, 3),
                    "best_s": round(min(walls), 3),
                    "median_s": round(statistics.median(walls), 3),
                }
            ),
            flush=True,
        )
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
