#!/usr/bin/env python
"""Scale study for the r13 retrieval family: BM25 (exact + hashed df),
hybrid RRF, deterministic shuffle-sharding, and the term-stats lake —
walls at sf0.1 (x1) and the document-axis replicas.

What the slopes should show if the plans are right:
- BM25 (both forms): linear in corpus size — one tokenize pass + hash
  aggs; the stats legs are 1-row broadcasts at any scale.
- RRF: ≈ BM25 + cosine leg; the fusion itself is O(k) and flat.
- shuffle-shards: linear — one exchange keyed by shard; the per-shard
  rank window never sees more than one shard per task.
- lake ingest: linear per batch; lake score: linear in the PROBE size
  with the lake stats a fixed ≤ n_buckets artifact regardless of how
  much corpus the lake has absorbed (the point of the hashed form).

Usage: python tools/scale_search.py [dir ...]   (default x1 + /tmp x30/x100)
Idle host, no concurrent Spark.
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
    "search_bm25_topk",
    "search_bm25_hashed_topk",
    "search_hybrid_rrf",
    "corpus_shuffle_shards",
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/scaled_x30_emb",
        "/tmp/scaled_x100_doc",
    ]
    spark = get_session("scale_search")
    registry = all_queries()
    out: dict[str, dict] = {}
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d} (missing)", file=sys.stderr)
            continue
        label = os.path.basename(d)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        cell: dict = {"n_docs": n_docs}
        for name in ENTRIES:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(registry[name].fn(spark, d))
                runs.append(time.perf_counter() - t0)
            cell[name] = round(min(runs), 3)

        # lake: ingest the corpus as 4 disjoint batches, then score a
        # fixed-size probe (the 5k sf0.1 documents) against it — the probe
        # cost must stay FLAT as the lake grows (stats are bounded).
        from gomaxscale_spark.streaming.term_stats import TermStatsLakeSink

        lake_path = f"/tmp/ts_lake_{label}"
        import shutil

        shutil.rmtree(lake_path, ignore_errors=True)
        sink = TermStatsLakeSink(lake_path)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        t0 = time.perf_counter()
        for i in range(4):
            sink.apply_batch(docs.filter(docs.doc_id % 4 == i), i)
        cell["lake_ingest_4_batches"] = round(time.perf_counter() - t0, 3)
        probe = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(sink.topk(probe, ["spark", "window", "hash"], 100))
            runs.append(time.perf_counter() - t0)
        cell["lake_probe_fixed_5k_docs"] = round(min(runs), 3)
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
