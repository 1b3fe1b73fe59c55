#!/usr/bin/env python
"""Ingest-vs-probe decomposition for the ANN SERVING ops (SCALING.md
r8). The one-shot catalog queries bundle both phases, which hides the
thing the adaptive widths exist to bound: in a serving deployment
signatures/assignments are computed ONCE at ingest, and the per-QUERY
cost is the probe — centroid/bucket ranking plus the probed rows'
exact scoring.

For each replica dir this script:
  1. INGEST (timed once): materializes the index tables to /tmp —
     - lsh: (vec_id, embedding, sig4, sig16)  [fixed 4-plane and full
       16-plane signatures, one scan]
     - ivf fixed:    (vec_id, embedding, centroid_id) at n_centroids=16
     - ivf adaptive: same at stride = smallest 2^w with (2^w)² ≥ N
  2. PROBE (timed best-of-3): the query-side work alone —
     - lsh fixed:    filter sig4 == qsig, cosine top-k
     - lsh adaptive: filter sig16 % 2^w == qsig % 2^w, cosine top-k
     - ivf fixed/adaptive: rank centroids vs the query, scan the
       n_probe probed lists, cosine top-k

One JSON line per measurement. Run on an idle host.

Usage: python tools/scale_ann_serving.py DIR[,DIR...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import similarity as S
from gomaxscale_spark.session import get_session


def qvec(spark, d):
    row = (
        spark.read.parquet(f"{d}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


def probe_times(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    dirs = sys.argv[1].split(",")
    spark = get_session("ann_serving")
    for d in dirs:
        tag = os.path.basename(d.rstrip("/"))
        # replicas are 1-2 parquet files; spread the ingest scans the
        # way a real multi-executor input already would be
        emb = spark.read.parquet(f"{d}/embeddings.parquet").repartition(
            spark.sparkContext.defaultParallelism
        )
        n = emb.count()
        q = qvec(spark, d)
        planes16 = S.hyperplanes(64, 16, seed=42)
        planes4 = planes16[:4]

        # ---- ingest: one signature scan carrying both widths
        idx = f"/tmp/ann_idx_{tag}"
        t0 = time.perf_counter()
        (
            emb.withColumn("sig4", S.lsh_signature(F.col("embedding"), planes4))
            .withColumn("sig16", S.lsh_signature(F.col("embedding"), planes16))
            .write.mode("overwrite")
            .parquet(f"{idx}/lsh")
        )
        lsh_ingest = round(time.perf_counter() - t0, 2)

        def ivf_assign(cent_df, out):
            t0 = time.perf_counter()
            (
                emb.join(F.broadcast(cent_df))
                .groupBy("vec_id")
                .agg(
                    F.max(
                        F.struct(
                            S.cosine(F.col("embedding"), F.col("centroid_vec")).alias("s"),
                            (-F.col("centroid_id")).alias("neg_cid"),
                        )
                    ).alias("m"),
                    F.first("embedding").alias("embedding"),
                )
                .select("vec_id", "embedding", (-F.col("m.neg_cid")).alias("centroid_id"))
                .write.mode("overwrite")
                .parquet(out)
            )
            return round(time.perf_counter() - t0, 2)

        from pyspark.sql import Window as W

        cent_fixed = (
            emb.orderBy("vec_id")
            .limit(16)
            .select(
                F.row_number().over(W.orderBy("vec_id")).alias("centroid_id"),
                F.col("embedding").alias("centroid_vec"),
            )
        )
        stride = 1 << max(2, (max(n - 1, 1).bit_length() + 1) // 2)
        cent_adapt = emb.filter(F.col("vec_id") % stride == 0).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
        )
        n_cent_adapt = cent_adapt.count()
        ivf_fixed_ingest = ivf_assign(cent_fixed, f"{idx}/ivf_fixed")
        ivf_adapt_ingest = ivf_assign(cent_adapt, f"{idx}/ivf_adapt")
        cent_fixed.write.mode("overwrite").parquet(f"{idx}/cent_fixed")
        cent_adapt.write.mode("overwrite").parquet(f"{idx}/cent_adapt")

        print(
            json.dumps(
                {
                    "dir": tag, "n": n, "phase": "ingest",
                    "lsh_s": lsh_ingest,
                    "ivf_fixed_s": ivf_fixed_ingest,
                    "ivf_adaptive_s": ivf_adapt_ingest,
                    "n_centroids_adaptive": n_cent_adapt,
                }
            ),
            flush=True,
        )

        # ---- probes
        lsh_tbl = spark.read.parquet(f"{idx}/lsh")
        qv = S.lit_vec(q)
        qsig4 = qsig16 = 0
        for i, plane in enumerate(planes16):
            s = sum(float(a) * float(b) for a, b in zip(q, plane))
            bit = 1 if s > 0 else 0
            qsig16 |= bit << i
            if i < 4:
                qsig4 |= bit << i

        # adaptive width from the corpus count (cached at serving time);
        # same boundaries as adaptive_pow2_case_sql(min_bits=4,
        # target_bucket=128)
        w = 4
        while (1 << w) * 128 < n and w < 16:
            w += 1
        p2 = 1 << w

        def lsh_probe(sig_col, target):
            (
                lsh_tbl.filter(F.col(sig_col) == target)
                .select("vec_id", F.round(S.cosine(F.col("embedding"), qv), 6).alias("score"))
                .orderBy(F.desc("score"), "vec_id")
                .limit(10)
                .collect()
            )

        lsh_fixed_probe = probe_times(lambda: lsh_probe("sig4", qsig4))
        lsh_adapt_probe = probe_times(
            lambda: (
                lsh_tbl.filter(F.col("sig16") % p2 == qsig16 % p2)
                .select("vec_id", F.round(S.cosine(F.col("embedding"), qv), 6).alias("score"))
                .orderBy(F.desc("score"), "vec_id")
                .limit(10)
                .collect()
            )
        )

        def ivf_probe(cent_path, assign_path):
            cents = spark.read.parquet(cent_path)
            probe = (
                cents.select("centroid_id", S.cosine(F.col("centroid_vec"), qv).alias("s"))
                .orderBy(F.desc("s"), "centroid_id")
                .limit(4)
                .select("centroid_id")
            )
            (
                spark.read.parquet(assign_path)
                .join(F.broadcast(probe), "centroid_id")
                .select("vec_id", F.round(S.cosine(F.col("embedding"), qv), 6).alias("score"))
                .orderBy(F.desc("score"), "vec_id")
                .limit(10)
                .collect()
            )

        ivf_fixed_probe = probe_times(
            lambda: ivf_probe(f"{idx}/cent_fixed", f"{idx}/ivf_fixed")
        )
        ivf_adapt_probe = probe_times(
            lambda: ivf_probe(f"{idx}/cent_adapt", f"{idx}/ivf_adapt")
        )

        # probed-row counts: the quantity the adaptive width bounds
        lsh_fixed_rows = lsh_tbl.filter(F.col("sig4") == qsig4).count()
        lsh_adapt_rows = lsh_tbl.filter(F.col("sig16") % p2 == qsig16 % p2).count()
        print(
            json.dumps(
                {
                    "dir": tag, "n": n, "phase": "probe",
                    "lsh_fixed_s": lsh_fixed_probe, "lsh_fixed_rows": lsh_fixed_rows,
                    "lsh_adaptive_s": lsh_adapt_probe, "lsh_adaptive_rows": lsh_adapt_rows,
                    "ivf_fixed_s": ivf_fixed_probe,
                    "ivf_adaptive_s": ivf_adapt_probe,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
