#!/usr/bin/env python
"""Scale study for the r14 additions: the sequence-assembly family
(chunking / packing / BPE pair counts) and the batched retrieval
serving forms, at sf0.1 (x1) and the document-axis replicas.

What the slopes should show if the plans are right:
- chunk_windows: linear — zero-exchange lateral explode; fan-out is
  ~n_tokens/stride rows carrying 32-byte hashes.
- pack_sequences: linear — one exchange keyed by shard + a partition-
  local cumsum window.
- bpe_pair_counts: SUBLINEAR in corpus rows once the vocabulary
  saturates — stage 2 (pair explode) runs over DISTINCT words only,
  so replicas that repeat text grow stage 1 but not stage 2.
- batched serving A/B: one bm25_topk_batch_against_stats pass vs Q
  sequential bm25_against_stats passes over the same stats artifact —
  the saving converges to ×1/Q in the corpus-scan-bound regime.

Usage: python tools/scale_sequence.py [dir ...]
       (default x1 + /tmp x30/x100). Idle host, no concurrent Spark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.plans import all_queries
from gomaxscale_spark.session import get_session

ENTRIES = (
    "text_chunk_windows",
    "corpus_pack_sequences",
    "text_bpe_pair_counts",
    "search_bm25_batch_hashed_topk",
    "search_hybrid_rrf_batch",
)

QUERIES = (["spark", "window", "hash"], ["data", "query", "table"],
           ["join", "agg", "scan"])


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
        "/tmp/scaled_x30_emb",
        "/tmp/scaled_x100_doc",
    ]
    spark = get_session("scale_sequence")
    registry = all_queries()
    out: dict[str, dict] = {}
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d} (missing)", file=sys.stderr)
            continue
        label = os.path.basename(d)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        cell: dict = {"n_docs": docs.count()}
        for name in ENTRIES:
            fn = registry[name].fn
            cell[name] = best_of(3, lambda: materialize(fn(spark, d)))
        # batched-vs-sequential serving A/B against ONE stats artifact
        from gomaxscale_spark.operators import search as SE

        ts, meta = SE.corpus_term_stats(docs)
        ts = ts.cache()
        meta = meta.cache()
        ts.count(), meta.count()
        cell["serving_batch_1pass"] = best_of(
            3,
            lambda: materialize(
                SE.bm25_topk_batch_against_stats(
                    docs, [list(q) for q in QUERIES], ts, meta, k=10
                )
            ),
        )

        def _sequential():
            for q in QUERIES:
                materialize(
                    SE.bm25_against_stats(docs, list(q), ts, meta)
                    .orderBy("score", ascending=False)
                    .limit(10)
                )

        cell["serving_sequential_3pass"] = best_of(3, _sequential)
        ts.unpersist(), meta.unpersist()
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
