#!/usr/bin/env python
"""Sweep bench cells' final plans for redundant-work smells (r16).

For every bench HEADLINE+EXTRA cell (or the names given), construct the
frame and count, in explain("formatted"):

- parquet scans, per table (a table appearing >1 means the steady-state
  plan re-reads it — the multi-scan family this round eliminates);
- Exchange nodes (minus ReusedExchange);
- BatchEvalPython / ArrowEvalPython nodes (Python boundary, guide §4);
- CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins);
- SortMergeJoin count (broadcast candidates, guide §3).

NOTE: fns that materialize eagerly truncate lineage — upstream stages
are invisible here (they appear as "Scan ExistingRDD"); those cells'
upstream shape is assessed by their probe wall, not this sweep.

Usage: python tools/plan_sweep.py [name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTRA)

    spark = get_session("plan_sweep")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = registry[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # streaming-only cells raise on fn()
            print(json.dumps({"name": name, "err": str(exc)[:120]}), flush=True)
            continue
        # r17 fix: Spark 4 "formatted" explain puts the file path on the
        # scan node's Location detail line, not the operator line — the
        # old same-line regex counted ZERO scans everywhere. One scan
        # node contributes exactly one Location line.
        tables = re.findall(
            r"Location: \w+ \[[^\]]*?(\w+)\.parquet", plan
        ) + re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        per_table: dict[str, int] = {}
        for t in tables:
            per_table[t] = per_table.get(t, 0) + 1
        rec = {
            "name": name,
            "scans": {t: n for t, n in sorted(per_table.items()) if n},
            "multi": {t: n for t, n in per_table.items() if n > 1},
            "exchanges": len(re.findall(r"\bExchange\b", plan))
            - len(re.findall(r"ReusedExchange", plan)),
            "reused": len(re.findall(r"ReusedExchange", plan)),
            "py": len(re.findall(r"BatchEvalPython", plan)),
            "arrow": len(re.findall(r"ArrowEvalPython", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "nested_loop": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
            "rdd_scans": len(re.findall(r"Scan ExistingRDD", plan)),
        }
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
