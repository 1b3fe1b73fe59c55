#!/usr/bin/env python
"""Batch-count scale study for the streaming dedup LAKE sink
(VERDICT r6 item 5): the one axis no replica study had touched.

Design claim under test: per-micro-batch cost is ∝ batch size +
candidate count, NOT lake size — the lake-side inputs to each batch
are (a) a broadcast-probed columnar scan of kept digests and (b) a
broadcast-probed columnar scan of the band index, with zero O(lake)
exchange (the batch side is always the broadcast build side). If the
claim holds, per-batch wall should stay ~flat as the lake grows from
batch 1 to batch K; the tell-tale failure shape is a linear ramp.

Harness: split an N×-replica documents table into K chronological
micro-batches by doc_id rank, drive them through
``IncrementalLSHDedupSink.apply_batch`` (the same code foreachBatch
calls), and record per-batch wall plus the final lake shape. Repeat
for K ∈ {10, 30, 100} so fixed per-batch overhead (Spark job launch,
localCheckpoint job, parquet commit — amortized at larger batch
sizes) separates from lake-growth terms (visible WITHIN a run as a
first→last-decile ramp).

Usage:
  python tools/scale_replica.py 10 /root/testdata/sf0.1 /tmp/x10_docs 0 documents
  python tools/scale_lake_batches.py /tmp/x10_docs 10,30,100 [max_bucket_size]

Prints one JSON line per K with per-decile mean batch wall, then a
summary table; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.session import get_session
from gomaxscale_spark.streaming.sinks import IncrementalLSHDedupSink


def run_study(sf_dir: str, ks: list[int], max_bucket_size: int | None) -> None:
    spark = get_session("lake_batch_study")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
    )
    n = docs.count()
    ids = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]
    print(f"# corpus: {n} docs from {sf_dir}", file=sys.stderr)

    for k in ks:
        lake = f"/tmp/lake_study_k{k}"
        shutil.rmtree(lake, ignore_errors=True)
        sink = IncrementalLSHDedupSink(
            lake, threshold=0.8, max_bucket_size=max_bucket_size
        )
        # chronological equal-count splits by doc_id rank
        cuts = [ids[min(n - 1, (i * n) // k)] for i in range(1, k)] + [ids[-1]]
        lo = None
        walls: list[float] = []
        for epoch, hi in enumerate(cuts):
            b = docs.filter(F.col("doc_id") <= hi)
            if lo is not None:
                b = b.filter(F.col("doc_id") > lo)
            lo = hi
            t0 = time.perf_counter()
            sink.apply_batch(b, epoch)
            walls.append(time.perf_counter() - t0)
        kept = spark.read.parquet(f"{lake}/kept")
        bands = spark.read.parquet(f"{lake}/bands")
        try:
            review_rows = spark.read.parquet(f"{lake}/review").count()
        except Exception:
            review_rows = 0
        # decile means: ramp detection (first vs last decile of batches)
        d = max(1, len(walls) // 10)
        deciles = [
            round(sum(walls[i : i + d]) / len(walls[i : i + d]), 3)
            for i in range(0, len(walls) - len(walls) % d, d)
        ]
        print(
            json.dumps(
                {
                    "k_batches": k,
                    "batch_docs": n // k,
                    "total_wall_s": round(sum(walls), 2),
                    "per_batch_mean_s": round(sum(walls) / len(walls), 3),
                    "first_decile_mean_s": deciles[0],
                    "last_decile_mean_s": deciles[-1],
                    "ramp_last_over_first": round(deciles[-1] / deciles[0], 2),
                    "decile_means_s": deciles,
                    "kept_rows": kept.count(),
                    "bands_rows": bands.count(),
                    "review_rows": review_rows,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "10,30,100").split(",")]
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else None
    run_study(sf_dir, ks, cap)
