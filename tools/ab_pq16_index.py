#!/usr/bin/env python
"""IVF-PQ index probes under the m=8 vs m=16 layouts at replica scale:
does the two-word code carry its full-scan recall win through the
partition-pruned probe path, and what does the batched probe pay?

For each replica dir: build TWO IVF-PQ indexes (same corpus, trained
m=8 and m=16 codebooks), then for Q query vectors compare
``probe_adc`` (n_probe=4) against the exact ``probe`` on the same
cells — recall@10 of the exact answer inside the ADC-shortlisted
re-rank at shortlist ∈ {50, 500} — plus probe walls and one
``probe_adc_batch`` wall for the batch path. Idle host, no concurrent
Spark.

Usage: python tools/ab_pq16_index.py [replica_dir ...] [--queries=Q]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import pq as PQ
from gomaxscale_spark.operators.ivf_index import IVFIndex
from gomaxscale_spark.session import get_session

SHORTLISTS = (50, 500)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_queries = 4
    for a in sys.argv[1:]:
        if a.startswith("--queries"):
            n_queries = int(a.split("=")[1])
    dirs = args or ["/tmp/scaled_x30_emb"]
    spark = get_session("ab_pq16_index")
    out = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        label = os.path.basename(d)
        queries = [
            [float(x) for x in r.embedding]
            for r in emb.orderBy("vec_id").limit(n_queries).collect()
        ]
        cell: dict = {"n_vectors": emb.count(), "n_queries": n_queries}
        for m in (8, 16):
            books = PQ.train_pq_codebooks(emb, m=m, n_iters=3)
            idx = IVFIndex(f"/tmp/ivfpq16ab_{label}_m{m}", codebooks=books)
            t0 = time.perf_counter()
            idx.build(emb, n_iters=1)
            rec = {
                "build_s": round(time.perf_counter() - t0, 1),
            }
            for s in SHORTLISTS:
                hits, walls = [], []
                for q in queries:
                    exact10 = [
                        r.vec_id
                        for r in idx.probe(spark, q, k=10, n_probe=4).collect()
                    ]
                    t0 = time.perf_counter()
                    got = {
                        r.vec_id
                        for r in idx.probe_adc(
                            spark, q, k=10, n_probe=4, shortlist=s
                        ).collect()
                    }
                    walls.append(time.perf_counter() - t0)
                    hits.append(len(got & set(exact10)) / 10)
                rec[f"recall@10_sl{s}"] = round(sum(hits) / len(hits), 2)
                rec[f"probe_adc_best_s_sl{s}"] = round(min(walls), 2)
            qdf = (
                emb.orderBy("vec_id")
                .limit(n_queries)
                .select(F.col("vec_id").alias("query_id"), "embedding")
            )
            t0 = time.perf_counter()
            idx.probe_adc_batch(qdf, k=10, n_probe=4, shortlist=500).write.format(
                "noop"
            ).mode("overwrite").save()
            rec["probe_adc_batch_s"] = round(time.perf_counter() - t0, 2)
            cell[f"m{m}"] = rec
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
