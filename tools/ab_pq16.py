#!/usr/bin/env python
"""m=8 vs m=16 PQ on the weak-margin replica corpora — does the
two-word layout recover the shortlist recall the r10 study lost?

SCALING.md r10 measured the m=8 trained-ADC top-50 shortlist at
recall@10 = 0.1 (x30) / 0.3 (x100) on the replica corpora (near-dup
families → tiny exact-distance margins) and named "more subspaces
(m=16)" as the not-yet-built escalation. This runs both layouts on the
same corpus/query set and prints recall@10 per shortlist size plus the
ADC scan wall (the 16 B/vector scan costs ~2× the 8 B one — the
recall-vs-bytes dial made explicit).

Usage: python tools/ab_pq16.py [replica_dir ...] [--queries=Q]
Idle host, no concurrent Spark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import pq as PQ
from gomaxscale_spark.operators import similarity as S
from gomaxscale_spark.session import get_session

SHORTLISTS = (50, 500, 2000)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_queries = 5
    for a in sys.argv[1:]:
        if a.startswith("--queries"):
            n_queries = int(a.split("=")[1])
    dirs = args or ["/tmp/scaled_x30_emb", "/tmp/scaled_x100_emb"]
    spark = get_session("ab_pq16")
    out = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        label = os.path.basename(d)
        qrows = emb.orderBy("vec_id").limit(n_queries).collect()
        queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
        exact10 = {
            qid: [r.vec_id for r in S.cosine_topk(emb, q, k=10).collect()]
            for qid, q in queries
        }
        cell: dict = {"n_vectors": emb.count(), "n_queries": n_queries}
        for m in (8, 16):
            books = PQ.train_pq_codebooks(emb, m=m, n_iters=3)
            codes_path = f"/tmp/pq16ab_{label}_m{m}"
            PQ.pq_encode(emb, books).write.mode("overwrite").parquet(codes_path)
            codes = spark.read.parquet(codes_path)
            walls = []
            rec = {s: [] for s in SHORTLISTS}
            for qid, q in queries:
                score = PQ.adc_score_sql(q, books)
                t0 = time.perf_counter()
                rows = (
                    codes.select("vec_id", F.expr(score).alias("__adc"))
                    .orderBy(F.asc("__adc"), "vec_id")
                    .limit(max(SHORTLISTS))
                    .collect()
                )
                walls.append(time.perf_counter() - t0)
                ranked = [r.vec_id for r in rows]
                for s in SHORTLISTS:
                    got = set(ranked[:s])
                    rec[s].append(len(got & set(exact10[qid])) / 10)
            cell[f"m{m}"] = {
                "adc_scan_best_s": round(min(walls), 2),
                **{
                    f"recall@10_top{s}": round(sum(v) / len(v), 2)
                    for s, v in rec.items()
                },
            }
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
