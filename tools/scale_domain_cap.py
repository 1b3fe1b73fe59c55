#!/usr/bin/env python
"""Skew A/B for the per-domain quality cap (VERDICT r8 item 3): the
window form (`row_number` over PARTITION BY source) vs the salted
two-phase selection (`operators/sampling.domain_cap_salted`) on a
replica corpus, uniform AND with 30% of all docs collapsed onto ONE
hot crawl domain — the exact shape the operator exists to guard
against (one domain's partition serializes through a single task's
sort under the window form).

Each cell: result-equality gate first (collected rows equal — a
fast-but-wrong selection cannot win), then best-of-R noop-write
walls. Run with NO concurrent Spark work.

Usage: python tools/scale_domain_cap.py [replica_dir ...] [--runs=R] [--hot=F]
Default replicas: /tmp/scaled_x10_emb /tmp/scaled_x30_emb /tmp/scaled_x100_emb
(documents.parquet in each), hot fraction 0.3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from gomaxscale_spark.operators.sampling import domain_cap_salted
from gomaxscale_spark.session import get_session

K = 15


def window_form(d):
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    )
    return (
        d.select("doc_id", "source", "n_chars", rnk.alias("rnk"))
        .filter(F.col("rnk") <= K)
        .drop("rnk")
    )


def best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/tmp/scaled_x10_emb",
        "/tmp/scaled_x30_emb",
        "/tmp/scaled_x100_emb",
    ]
    runs, hot = 3, 0.3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
        if a.startswith("--hot="):
            hot = float(a.split("=")[1])
    spark = get_session("scale_domain_cap")
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        n = docs.count()
        label = os.path.basename(d)
        for shape in ("uniform", "hot"):
            inp = docs
            if shape == "hot":
                inp = docs.withColumn(
                    "source",
                    F.when(
                        (F.abs(F.xxhash64("doc_id")) % 1000) < int(hot * 1000),
                        F.lit("hot.example.com"),
                    ).otherwise(F.col("source")),
                )
            wrows = sorted(map(tuple, window_form(inp).collect()))
            srows = sorted(
                map(
                    tuple,
                    domain_cap_salted(inp, "source", "n_chars", "doc_id", k=K)
                    .select("doc_id", "source", "n_chars")
                    .collect(),
                )
            )
            cell = {
                "replica": label,
                "shape": shape,
                "n_docs": n,
                "equal": wrows == srows,
                "out_rows": len(wrows),
                "window_s": best_of(lambda: window_form(inp), runs),
                "salted_s": best_of(
                    lambda: domain_cap_salted(inp, "source", "n_chars", "doc_id", k=K),
                    runs,
                ),
            }
            print(json.dumps(cell), flush=True)


if __name__ == "__main__":
    main()
