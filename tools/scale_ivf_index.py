#!/usr/bin/env python
"""Build-vs-probe decomposition for the materialized IVF index
(operators/ivf_index.py) at replica scale: the build pays assignment
once (numpy kernel); probes should then cost ~n_probe cells of scan
regardless of corpus size — compare against ivf_topk_adaptive, which
re-prices assignment into every one-shot call.

Run with NO concurrent Spark work.

Usage: python tools/scale_ivf_index.py [replica_dir ...] [--probes=R]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import similarity as S
from gomaxscale_spark.operators.ivf_index import IVFIndex
from gomaxscale_spark.session import get_session


def main() -> None:
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/tmp/scaled_x10_emb",
        "/tmp/scaled_x30_emb",
        "/tmp/scaled_x100_emb",
    ]
    probes = 3
    for a in sys.argv[1:]:
        if a.startswith("--probes="):
            probes = int(a.split("=")[1])
    spark = get_session("scale_ivf_index")
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        q = [float(x) for x in emb.orderBy("vec_id").limit(1).head().embedding]
        label = os.path.basename(d)
        path = f"/tmp/ivf_index_study_{label}"
        shutil.rmtree(path, ignore_errors=True)
        idx = IVFIndex(path)

        t0 = time.perf_counter()
        stats = idx.build(emb, n_iters=1)
        build_s = round(time.perf_counter() - t0, 2)

        probe_best = float("inf")
        for _ in range(probes):
            t0 = time.perf_counter()
            rows = idx.probe(spark, q, k=10, n_probe=4).collect()
            probe_best = min(probe_best, time.perf_counter() - t0)
        probed_rows = (
            spark.read.parquet(f"{path}/vectors")
            .filter(F.col("centroid_id").isin(idx._probe_cells(spark, q, 4)))
            .count()
        )

        oneshot_best = float("inf")
        for _ in range(probes):
            t0 = time.perf_counter()
            S.ivf_topk_adaptive(emb, q, k=10, n_probe=4, kernel="numpy").collect()
            oneshot_best = min(oneshot_best, time.perf_counter() - t0)

        print(
            json.dumps(
                {
                    "replica": label,
                    "n_vectors": n,
                    "n_centroids": stats["n_centroids"],
                    "build_s": build_s,
                    "probe_best_s": round(probe_best, 3),
                    "probed_rows": probed_rows,
                    "oneshot_adaptive_best_s": round(oneshot_best, 3),
                    "topk_first": rows[0].vec_id if rows else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
