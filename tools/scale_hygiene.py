#!/usr/bin/env python
"""Scale study for the r14 corpus hygiene & mixing family at sf0.1
(x1) and the document-axis replicas (documents + embeddings scaled).

What the slopes should show if the plans are right:
- epoch_upsample: linear, zero exchanges — pure map + bounded explode.
- filter_ablation_matrix: linear — one partial-aggregable hash agg
  with <=2^4 output rows.
- soft_dedup_weights: ~linear — chunk fan-out is tokens/stride rows of
  32-byte digests; the digest agg output is vocabulary-bound.
- decontaminate_embedding_cosine: linear in the corpus with the
  benchmark-matrix constant riding task-local (production holds B
  fixed; here B = id%41 grows with the replica, so the measured cell
  slightly overstates the production slope — both shown).
- semantic_dedup: the A/B that matters — FIXED k goes quadratic per
  cluster as the corpus grows (pairs ~ (N/k)^2 * k), while k GROWN
  with N (the SemDeDup paper's own topology, target cluster size held
  ~constant) keeps the pair fan-out linear. Fixed k=16 is run at x30
  only (x100 would be ~1.2G pairs — the point of the study is that
  you never run that shape).

Usage: python tools/scale_hygiene.py [dir ...]
       (default x1 + /tmp x30/x100 doc-axis replicas).
       Idle host, no concurrent Spark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.operators import similarity as S
from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session

DOC_ENTRIES = (
    "sampling_epoch_upsample",
    "text_filter_ablation_matrix",
    "sampling_soft_dedup_weights",
    "decontaminate_embedding_cosine",
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_of(n, fn) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/scaled_x30_doc",
        "/tmp/scaled_x100_doc",
    ]
    spark = get_session("scale_hygiene")
    registry = all_queries()
    out: dict[str, dict] = {}
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d} (missing)", file=sys.stderr)
            continue
        label = os.path.basename(d)
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n_vec = emb.count()
        cell: dict = {
            "n_docs": spark.read.parquet(f"{d}/documents.parquet").count(),
            "n_vectors": n_vec,
        }
        for name in DOC_ENTRIES:
            fn = registry[name].fn
            cell[name] = best_of(3, lambda: materialize(fn(spark, d)))
        # SemDeDup k policy A/B: k grown with N (target cluster ~125
        # vectors — the paper's bounded-fan-out topology) vs the
        # x1-oracle k=16 held fixed (quadratic per cluster; x30 only).
        k_grown = max(16, n_vec // 125)
        cell["semantic_dedup_k"] = k_grown
        cell["semantic_dedup_k_grown"] = best_of(
            3,
            lambda: materialize(
                S.semantic_dedup(emb, n_clusters=k_grown, threshold=0.35)
            ),
        )
        if n_vec <= 70_000:
            cell["semantic_dedup_k16_fixed"] = best_of(
                1,
                lambda: materialize(
                    S.semantic_dedup(emb, n_clusters=16, threshold=0.35)
                ),
            )
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
