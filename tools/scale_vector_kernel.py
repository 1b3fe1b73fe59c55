#!/usr/bin/env python
"""A/B the dense-cosine kernels at replica scale (VERDICT r8 item 1):
the interpreted HOF fold vs the Arrow-batched numpy matmul
(operators/vector_kernel.py) on the three measured hot spots —

  - ivf_topk_adaptive      (the N×√N assignment fan-out: 55 s at
                            200k×391 on 32 cores under HOF, SCALING.md r8)
  - kmeans_centroid_vectors (one Lloyd iteration, same assignment shape)
  - lsh_near_duplicates_adaptive (exact-cosine verify of the candidate
                            pairs — the lakes' verify-join kernel)

Each cell is best-of-R wall of a full noop-write materialization, and
each A/B runs result-parity first (collected rows equal) so a fast-but-
wrong kernel can't win. Run with NO concurrent Spark work.

Usage: python tools/scale_vector_kernel.py [replica_dir ...] [--runs R]
Default replicas: /tmp/scaled_x10_emb /tmp/scaled_x30_emb /tmp/scaled_x100_emb
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.operators import similarity as S
from gomaxscale_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(fn())
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    dirs = args or [
        "/tmp/scaled_x10_emb",
        "/tmp/scaled_x30_emb",
        "/tmp/scaled_x100_emb",
    ]
    spark = get_session("scale_vector_kernel")
    out = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        q = [float(x) for x in emb.orderBy("vec_id").limit(1).head().embedding]
        label = os.path.basename(d)
        cell: dict = {"n_vectors": n}

        # parity gates (one run each, collected)
        ih = S.ivf_topk_adaptive(emb, q, k=10, n_probe=4, kernel="hof").collect()
        iv = S.ivf_topk_adaptive(emb, q, k=10, n_probe=4, kernel="numpy").collect()
        cell["ivf_parity"] = [tuple(r) for r in ih] == [tuple(r) for r in iv]

        cell["ivf_hof"] = best_of(
            lambda: S.ivf_topk_adaptive(emb, q, k=10, n_probe=4, kernel="hof"), runs
        )
        cell["ivf_numpy"] = best_of(
            lambda: S.ivf_topk_adaptive(emb, q, k=10, n_probe=4, kernel="numpy"), runs
        )

        kh = S.kmeans_centroid_vectors(emb, 16, 1, kernel="hof").collect()
        kv = S.kmeans_centroid_vectors(emb, 16, 1, kernel="numpy").collect()
        cell["kmeans_parity"] = sorted(
            (r.centroid_id, tuple(r.centroid_vec)) for r in kh
        ) == sorted((r.centroid_id, tuple(r.centroid_vec)) for r in kv)
        cell["kmeans_hof"] = best_of(
            lambda: S.kmeans_centroid_vectors(emb, 16, 1, kernel="hof"), runs
        )
        cell["kmeans_numpy"] = best_of(
            lambda: S.kmeans_centroid_vectors(emb, 16, 1, kernel="numpy"), runs
        )

        lh = S.lsh_near_duplicates_adaptive(emb, 0.3, 64, kernel="hof").collect()
        lv = S.lsh_near_duplicates_adaptive(emb, 0.3, 64, kernel="numpy").collect()
        cell["lsh_verify_parity"] = sorted(map(tuple, lh)) == sorted(map(tuple, lv))
        cell["lsh_n_pairs"] = len(lh)
        cell["lsh_hof"] = best_of(
            lambda: S.lsh_near_duplicates_adaptive(emb, 0.3, 64, kernel="hof"), runs
        )
        cell["lsh_numpy"] = best_of(
            lambda: S.lsh_near_duplicates_adaptive(emb, 0.3, 64, kernel="numpy"), runs
        )

        out[label] = cell
        print("CELL " + json.dumps({label: cell}), flush=True)
    print("VECTOR_KERNEL_AB " + json.dumps(out))


if __name__ == "__main__":
    main()
