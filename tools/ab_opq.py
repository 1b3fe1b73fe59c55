#!/usr/bin/env python
"""OPQ vs plain PQ on the weak-margin replica corpora (VERDICT r11
item 2) — does the trained rotation buy shortlist recall the subspace
split alone can't?

Extends tools/ab_pq16.py: same corpora (near-dup families → tiny exact-
distance margins), same recall@10-per-shortlist protocol, now four
arms — trained PQ and trained OPQ at m=8 and m=16. The rotation's
promise: correlated dimensions stop landing in the same quantization
cell, so equal code budget yields lower quantization error and a
shorter shortlist for the same recall. ADC scan walls ride along (the
rotation is ingest-time; probe cost is identical per m).

Usage: python tools/ab_opq.py [replica_dir ...] [--queries=Q]
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
    spread = False
    for a in sys.argv[1:]:
        if a.startswith("--queries"):
            n_queries = int(a.split("=")[1])
        if a == "--spread":
            # r13: the first-Q vec_ids are all from the first Q/family
            # near-dup FAMILIES (the replica generator lays families out
            # contiguously), so the default query set measures ~2
            # families. --spread strides the id space for a corpus-wide
            # query mix instead.
            spread = True
    dirs = args or ["/tmp/scaled_x30_emb", "/tmp/scaled_x100_emb"]
    spark = get_session("ab_opq")
    out = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        label = os.path.basename(d)
        if spread:
            n_total = emb.count()
            stride = max(1, n_total // n_queries)
            qrows = (
                emb.filter(F.col("vec_id") % stride == 0)
                .orderBy("vec_id")
                .limit(n_queries)
                .collect()
            )
        else:
            qrows = emb.orderBy("vec_id").limit(n_queries).collect()
        queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
        exact10 = {
            qid: [r.vec_id for r in S.cosine_topk(emb, q, k=10).collect()]
            for qid, q in queries
        }
        cell: dict = {"n_vectors": emb.count(), "n_queries": n_queries}
        for m in (8, 16):
            arms = {
                f"pq_m{m}": (None, PQ.train_pq_codebooks(emb, m=m, n_iters=3)),
            }
            R, books = PQ.train_opq(emb, m=m, n_iters=6, kmeans_iters=3)
            arms[f"opq_m{m}"] = (R, books)
            for arm, (rot, books) in arms.items():
                codes_path = f"/tmp/opqab_{label}_{arm}"
                enc = (
                    PQ.opq_encode(emb, rot, books)
                    if rot is not None
                    else PQ.pq_encode(emb, books)
                )
                enc.write.mode("overwrite").parquet(codes_path)
                codes = spark.read.parquet(codes_path)
                walls = []
                rec = {s: [] for s in SHORTLISTS}
                for qid, q in queries:
                    qv = PQ.rotate_query(rot, q) if rot is not None else q
                    score = PQ.adc_score_sql(qv, books)
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
                cell[arm] = {
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
