#!/usr/bin/env python
"""PQ/ADC at replica scale: (a) full-corpus ADC rank (8-byte code
scan + LUT lookups) vs the exact brute-force cosine top-k, (b)
IVF-PQ ``probe_adc`` vs the exact ``probe`` on the same materialized
index, plus the shortlist-recall row that makes the speed honest.

The sandbox's wall times understate the I/O story (the corpus fits in
page cache; a 100 TB scan does not), so the recall + rows/bytes shape
is the verdict and the wall is the sanity check. Codebooks are the
TRAINED ones (the production path). Run with NO concurrent Spark work.

Usage: python tools/scale_pq.py [replica_dir ...] [--runs=R]
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
from gomaxscale_spark.operators.ivf_index import IVFIndex
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
    dirs = args or ["/tmp/scaled_x30_emb", "/tmp/scaled_x100_emb"]
    spark = get_session("scale_pq")
    out = {}
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        label = os.path.basename(d)
        q = [float(x) for x in emb.orderBy("vec_id").limit(1).head().embedding]
        cell: dict = {"n_vectors": n}

        books = PQ.train_pq_codebooks(emb, n_iters=3)
        codes_path = f"/tmp/pq_codes_{label}"
        PQ.pq_encode(emb, books).write.mode("overwrite").parquet(codes_path)
        codes = spark.read.parquet(codes_path)

        # (a) full-corpus rank: ADC over the stored code column vs the
        # exact cosine scan over raw vectors (both TakeOrdered)
        score = PQ.adc_score_sql(q, books)
        cell["adc_scan"] = best_of(
            lambda: codes.select("vec_id", F.expr(score).alias("__adc"))
            .orderBy(F.asc("__adc"), "vec_id")
            .limit(50),
            runs,
        )
        cell["exact_scan"] = best_of(
            lambda: S.cosine_topk(emb, q, k=50), runs
        )

        # recall of the ADC top-50 shortlist against the exact top-10
        short_ids = {
            r.vec_id
            for r in codes.select("vec_id", F.expr(score).alias("__adc"))
            .orderBy(F.asc("__adc"), "vec_id")
            .limit(50)
            .collect()
        }
        exact10 = [
            r.vec_id
            for r in S.cosine_topk(emb, q, k=10).collect()
        ]
        cell["shortlist_recall_at10"] = round(
            len(short_ids & set(exact10)) / 10, 2
        )

        # (b) the materialized index: probe_adc vs exact probe
        idx = IVFIndex(f"/tmp/ivfpq_{label}", codebooks=books)
        t0 = time.perf_counter()
        stats = idx.build(emb, n_iters=1)
        cell["build_s"] = round(time.perf_counter() - t0, 2)
        cell["n_cells"] = stats["n_centroids"]
        cell["probe_exact"] = best_of(
            lambda: idx.probe(spark, q, k=10, n_probe=4), runs
        )
        cell["probe_adc"] = best_of(
            lambda: idx.probe_adc(spark, q, k=10, n_probe=4), runs
        )
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
        with open("/tmp/scale_pq.json", "w") as fh:
            json.dump(out, fh)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
