#!/usr/bin/env python
"""Probe-latency-vs-epoch-count study for the embedding lake's serving
path (VERDICT r8 item 6): ``topk()`` reads ``bands/`` + ``kept/`` across
ALL committed epoch dirs, so after ~10² epochs the small-files tax the
text lake already measured (2× per-batch wall at 100 epochs
pre-compaction) should reappear on the PROBE — and ``compact()`` should
flatten it back. This measures exactly that curve and the cadence that
keeps the probe flat.

Protocol: stream the corpus into the lake in K equal micro-batches; at
each checkpoint epoch count, pause and take a best-of-3 ``topk()``
probe wall plus the lake's file census (epoch dirs, parquet files).
After the final checkpoint, ``compact()`` and probe again — same data,
one epoch dir — so the delta is purely the many-files tax.

Run with NO concurrent Spark work.

Usage: python tools/scale_probe_epochs.py [replica_dir] [K] [checkpoints]
Default: /tmp/scaled_x10_emb 100 10,25,50,75,100
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.session import get_session
from gomaxscale_spark.streaming.embedding_index import IncrementalEmbeddingIndexSink


def census(lake: str) -> dict:
    out = {}
    for sub in ("kept", "bands"):
        root = f"{lake}/{sub}"
        dirs = [e for e in os.listdir(root)] if os.path.isdir(root) else []
        out[f"{sub}_epoch_dirs"] = sum(e.startswith("epoch=") for e in dirs)
        out[f"{sub}_files"] = len(glob.glob(f"{root}/epoch=*/*.parquet"))
    return out


def probe(sink, spark, qvec, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        sink.topk(spark, qvec, k=10).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaled_x10_emb"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    checkpoints = sorted(
        int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "10,25,50,75,100").split(",")
    )
    spark = get_session("probe_epoch_study")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").collect()]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == ids[0]).select("embedding").head()[0]
    ]
    lake = "/tmp/emb_probe_epoch_study"
    shutil.rmtree(lake, ignore_errors=True)
    sink = IncrementalEmbeddingIndexSink(lake, threshold=0.3)
    print(f"# corpus: {n} vectors, {k} batches, checkpoints {checkpoints}",
          file=sys.stderr)

    cuts = [ids[min(n - 1, (i * n) // k)] for i in range(1, k)] + [ids[-1]]
    lo = None
    for epoch, hi in enumerate(cuts):
        b = emb.filter(F.col("vec_id") <= hi)
        if lo is not None:
            b = b.filter(F.col("vec_id") > lo)
        lo = hi
        sink.apply_batch(b, epoch)
        if (epoch + 1) in checkpoints:
            row = {"epochs": epoch + 1, "probe_best_s": probe(sink, spark, qvec)}
            row.update(census(lake))
            print(json.dumps(row), flush=True)

    sink.compact(spark)
    row = {"epochs": "compacted", "probe_best_s": probe(sink, spark, qvec)}
    row.update(census(lake))
    row["kept_rows"] = sink.read_kept(spark).count()
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
