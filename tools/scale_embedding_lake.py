#!/usr/bin/env python
"""Batch-count scale study for the streaming EMBEDDING index lake
(IncrementalEmbeddingIndexSink) — the embedding twin of
tools/scale_lake_batches.py, same claim under test:

per-micro-batch cost is ∝ batch size + candidate count, NOT lake
size — the lake-side inputs (kept ids for the count, the band index
for the bucket join, kept vectors for candidate-adjacent verify) are
broadcast-probed columnar scans with zero O(lake) exchange. If that
holds, per-batch wall stays ~flat as the lake grows batch 1 → K; the
failure shape is a linear ramp. The probe serving path gets its own
timing: topk() best-of-3 against the final lake.

Usage:
  python tools/scale_replica.py 10 /root/testdata/sf0.1 /tmp/x10_emb 0 embeddings
  python tools/scale_embedding_lake.py /tmp/x10_emb 10,30 [threshold]

One JSON line per K; paste into SCALING.md.
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
from gomaxscale_spark.streaming.embedding_index import IncrementalEmbeddingIndexSink


def run_study(sf_dir: str, ks: list[int], threshold: float,
              max_bucket_size=None) -> None:
    spark = get_session("embedding_lake_study")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").collect()]
    qrow = emb.filter(F.col("vec_id") == ids[0]).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    print(f"# corpus: {n} vectors from {sf_dir}", file=sys.stderr)

    for k in ks:
        lake = f"/tmp/emb_lake_study_k{k}_{max_bucket_size}"
        shutil.rmtree(lake, ignore_errors=True)
        sink = IncrementalEmbeddingIndexSink(
            lake, threshold=threshold, max_bucket_size=max_bucket_size
        )
        cuts = [ids[min(n - 1, (i * n) // k)] for i in range(1, k)] + [ids[-1]]
        lo = None
        walls: list[float] = []
        for epoch, hi in enumerate(cuts):
            b = emb.filter(F.col("vec_id") <= hi)
            if lo is not None:
                b = b.filter(F.col("vec_id") > lo)
            lo = hi
            t0 = time.perf_counter()
            sink.apply_batch(b, epoch)
            walls.append(time.perf_counter() - t0)
        kept = spark.read.parquet(f"{lake}/kept")
        bands = spark.read.parquet(f"{lake}/bands")
        d = max(1, len(walls) // 10)
        deciles = [
            round(sum(walls[i : i + d]) / len(walls[i : i + d]), 3)
            for i in range(0, len(walls) - len(walls) % d, d)
        ]
        probe = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sink.topk(spark, qvec, k=10).collect()
            probe = min(probe, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "k_batches": k,
                    "cap": max_bucket_size,
                    "batch_vecs": n // k,
                    "total_wall_s": round(sum(walls), 2),
                    "per_batch_mean_s": round(sum(walls) / len(walls), 3),
                    "first_decile_mean_s": deciles[0],
                    "last_decile_mean_s": deciles[-1],
                    "ramp_last_over_first": round(deciles[-1] / deciles[0], 2),
                    "decile_means_s": deciles,
                    "kept_rows": kept.count(),
                    "bands_rows": bands.count(),
                    "topk_probe_best_s": round(probe, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "10,30").split(",")]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else None
    run_study(sf_dir, ks, thr, max_bucket_size=cap)
