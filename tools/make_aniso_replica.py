#!/usr/bin/env python
"""Build an ANISOTROPIC synthetic embedding replica (VERDICT r12 item
5): the r12 OPQ study came back a wash because the sandbox corpus is
near-isotropic (covariance eigen-ratio 1.64, top-8/64 eigenvalue share
15.1% vs the 12.5% isotropic floor — measured by dq_embedding_profile).
Real text-encoder embeddings are nothing like that: their spectra decay
fast (eigen-ratios in the 10²-10³ range), which is exactly the variance
imbalance OPQ's rotation exists to redistribute (Ge et al., CVPR 2013).

This generator produces embeddings with a CONTROLLED spectrum so the
OPQ-vs-PQ comparison can run on the data shape the escalation targets:

- eigenvalues λ_i decay geometrically with λ_1/λ_64 = --eigen-ratio
  (default 100);
- a fixed-seed random orthogonal basis mixes the principal axes away
  from the coordinate axes (axis-aligned anisotropy would be handled by
  PQ's subspace split alone — real encoders give you no such gift);
- near-dup family structure matches the other replica studies: seeds
  replicated with small isotropic noise, so exact-distance margins stay
  tight and shortlist recall is a meaningful measurement;
- vectors are L2-normalized (cosine-similarity corpora ship normalized).

Pure numpy + pyarrow — no Spark session; the output matches the
testdata embeddings schema (vec_id int64, embedding list<float>,
label int32). Deterministic for a given seed.

Usage: python tools/make_aniso_replica.py [out_dir] [n_vectors]
           [--dim=64] [--eigen-ratio=100] [--family=6] [--seed=13]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/aniso_x30_emb"
    n_vectors = int(args[1]) if len(args) > 1 else 60_000
    opts = {
        k: v
        for k, v in (
            a.lstrip("-").split("=") for a in sys.argv[1:] if a.startswith("--")
        )
    }
    dim = int(opts.get("dim", 64))
    eigen_ratio = float(opts.get("eigen-ratio", 100.0))
    family = int(opts.get("family", 6))  # vectors per near-dup family
    seed = int(opts.get("seed", 13))

    rng = np.random.default_rng(seed)

    # geometric spectrum: λ_i = r^(i/(dim-1)), λ_1/λ_dim = eigen_ratio
    lam = eigen_ratio ** (-np.arange(dim) / (dim - 1))
    # fixed random orthogonal basis (QR of a Gaussian matrix)
    q_mat, r_mat = np.linalg.qr(rng.standard_normal((dim, dim)))
    q_mat *= np.sign(np.diag(r_mat))  # canonical sign, determinism-friendly

    n_seeds = (n_vectors + family - 1) // family
    seeds = rng.standard_normal((n_seeds, dim)) * np.sqrt(lam)
    base = np.repeat(seeds, family, axis=0)[:n_vectors]
    # small noise in the SAME anisotropic metric: families stay near-dup
    # along every principal axis, margins tight like the text replicas
    noise = rng.standard_normal(base.shape) * np.sqrt(lam) * 0.05
    vecs = (base + noise) @ q_mat.T
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    # measured spectrum AFTER normalization (what the study will see)
    cov = np.cov(vecs, rowvar=False)
    ev = np.linalg.eigvalsh(cov)[::-1]
    stats = {
        "n_vectors": int(n_vectors),
        "dim": dim,
        "target_eigen_ratio": eigen_ratio,
        "measured_eigen_ratio": round(float(ev[0] / ev[-1]), 2),
        "top8_share": round(float(ev[:8].sum() / ev.sum()), 4),
        "isotropic_top8_share": round(8 / dim, 4),
    }

    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vectors, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(n_vectors) // family % 32).astype(np.int32)
            ),
        }
    )
    pq.write_table(table, f"{out_dir}/embeddings.parquet")
    with open(f"{out_dir}/aniso_stats.json", "w") as f:
        json.dump(stats, f)
    print(json.dumps({"out": out_dir, **stats}))


if __name__ == "__main__":
    main()
