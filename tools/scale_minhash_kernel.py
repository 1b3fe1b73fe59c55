#!/usr/bin/env python
"""A/B the portable MinHash SIGNATURE kernels at replica scale
(VERDICT r9 item 3: post-cosine-kernel, signature generation is the
measured dominant dedup cost — 71 s of the x100 verify-leg A/B):

  sql   — the in-plan emitters (md5/conv per token occurrence,
          explode → 64 partial-agg min columns, one exchange)
  numpy — Arrow-batched mapInPandas (distinct-token md5 per task,
          vectorized CW mins, NO exchange)
          (operators/dedup.py portable_minhash_signatures_numpy)

Gate first, time second: each cell runs an IN-PLAN bit-equality check
(full outer join on id, any mismatching signature array fails the
cell) before timing — the family is pure integer math, so equality is
exact, not a rounding contract. Timings are best-of-R of a full noop-
write materialization; DataFrame CONSTRUCTION time is recorded
separately (the r5 lesson: hundreds of F.expr calls put driver
seconds into construction, invisible to executor profiles).

Also times the HEADLINE SHAPE end-to-end (minhash_lsh_candidates +
exact-Jaccard verify, the dedup_minhash_lsh catalog entry) under both
kernels, since banding/verify may mask or amplify the sig-stage win.

Run with NO concurrent Spark work.

Usage: python tools/scale_minhash_kernel.py [replica_dir ...] [--runs=R]
Default replicas: /root/testdata/sf0.1 /tmp/scaled_x30_docs /tmp/scaled_x100_docs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import dedup as D
from gomaxscale_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_of(build, runs: int) -> dict:
    """(construct_s, best exec_s) for a thunk returning a DataFrame."""
    best, construct = float("inf"), 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        df = build()
        t1 = time.perf_counter()
        materialize(df)
        t2 = time.perf_counter()
        construct = max(construct, t1 - t0)
        best = min(best, t2 - t1)
    return {"construct": round(construct, 3), "exec": round(best, 2)}


def sigs(docs, kernel: str, shingle_n: int = 2):
    if kernel == "numpy":
        return D.portable_minhash_signatures_numpy(
            docs, "doc_id", "text", 64, shingle_n
        )
    return D.portable_minhash_signatures(docs, "doc_id", "text", 64, shingle_n)


def headline(docs, kernel: str):
    cands = D.minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2,
        portable=True, sig_kernel=kernel,
    )
    return D.verify_candidates_jaccard(
        docs, cands, "doc_id", "text", threshold=0.8, shingle_n=2
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    dirs = args or [
        "/root/testdata/sf0.1",
        "/tmp/scaled_x30_docs",
        "/tmp/scaled_x100_docs",
    ]
    spark = get_session("scale_minhash_kernel")
    out = {}
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()
        label = os.path.basename(d)
        cell: dict = {"n_docs": n}

        # ---- bit-equality gate (in-plan; no driver-side signature blobs).
        # Broadcast disabled for the gate only: at x100 the two
        # (id, 64-long) frames are ~256 MB each and AQE's stats-blind
        # estimate of the mapInPandas side tries to broadcast it —
        # notEnoughMemoryToBuildAndBroadcastTable on an 8g driver.
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = sigs(docs, "sql").withColumnRenamed("minhash", "mh_sql")
            b = sigs(docs, "numpy").withColumnRenamed("minhash", "mh_np")
            j = a.join(b, "doc_id", "full")
            bad = j.filter(
                F.col("mh_sql").isNull()
                | F.col("mh_np").isNull()
                | (F.col("mh_sql") != F.col("mh_np"))
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        cell["bit_equal"] = bad == 0
        if bad:
            cell["mismatches"] = bad
            out[label] = cell
            print(json.dumps({label: cell}), flush=True)
            continue

        cell["sig_sql"] = best_of(lambda: sigs(docs, "sql"), runs)
        cell["sig_numpy"] = best_of(lambda: sigs(docs, "numpy"), runs)
        cell["headline_sql"] = best_of(lambda: headline(docs, "sql"), runs)
        cell["headline_numpy"] = best_of(lambda: headline(docs, "numpy"), runs)
        # headline parity (same candidates → same verified pairs)
        hs = headline(docs, "sql").orderBy("id_a", "id_b").collect()
        hn = headline(docs, "numpy").orderBy("id_a", "id_b").collect()
        cell["headline_parity"] = [tuple(r) for r in hs] == [tuple(r) for r in hn]
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
        with open("/tmp/minhash_ab.json", "w") as fh:  # survives a later crash
            json.dump(out, fh)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
