#!/usr/bin/env python
"""Interleaved same-session A/B of spark.sql.join.preferSortMergeJoin
(true = default sort-merge preference, false = allow shuffled-hash when
its size conditions fit — guide §3.1/§9) over the join-heavy bench
cells. Alternates the conf per round; fresh construction + noop per
measurement so each form pays full planning under its own setting.

Usage: python tools/ab_prefer_shj.py [rounds] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_CELLS = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q21_suppliers_kept_waiting",
    "flagship_user_activity",
    "range_join_bucketed",
    "asof_join_purchase_attribution",
]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT_CELLS
    spark = get_session("ab_prefer_shj")
    registry = all_queries()
    # warm the scan cache once
    registry["scan_filter_project"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        walls = {"smj": [], "shj": []}
        for r in range(rounds):
            for label, conf in (("smj", "true"), ("shj", "false")):
                spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
                spark.sparkContext.setJobDescription(f"{name} {label} r{r}")
                t0 = time.time()
                registry[name].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[label].append(time.time() - t0)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        s, h = walls["smj"], walls["shj"]
        print(
            f"{name}: smj={['%.2f' % x for x in s]} shj={['%.2f' % x for x in h]}"
            f"  median smj={sorted(s)[len(s)//2]:.2f} shj={sorted(h)[len(h)//2]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
