#!/usr/bin/env python
"""Run the SCALING.md replica study for a set of catalog queries over a
set of SF dirs (built by tools/scale_replica.py). One JSON line per
(query, dir): wall seconds (single shot, noop sink — the same honest
full-materialization bench.py uses) + output row count, plus the
review-queue row count for capped-LSH entries (the bounded-control-loop
check the 100× study exists to make).

Usage: python tools/scale_study.py QUERY[,QUERY...] DIR[,DIR...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session


def main() -> None:
    queries = sys.argv[1].split(",")
    dirs = sys.argv[2].split(",")
    spark = get_session("scale_study")
    registry = all_queries()
    for d in dirs:
        for q in queries:
            start = time.perf_counter()
            df = registry[q].fn(spark, d)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - start, 1)
            rows = df.count()
            rec = {"query": q, "dir": os.path.basename(d), "wall_s": wall, "rows": rows}
            if "kind" in df.columns:
                rec["review_rows"] = df.filter(F.col("kind") == "hot_bucket").count()
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
