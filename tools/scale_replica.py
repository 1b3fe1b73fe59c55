#!/usr/bin/env python
"""Build an N×-scaled replica of a testdata SF directory for scaling
studies (``/root/testdata`` is read-only, so replicas land in /tmp).

Fact tables are replicated with join keys offset per copy so key
cardinality grows linearly and join fan-out stays 1:1 — without the
offsets every equi-join would blow up quadratically in N and the
measured slope would be meaningless. Dimension tables (region, nation,
supplier, part) are kept at one copy: dims grow sub-linearly in real
lakes and the plans broadcast them anyway.

Key map (copy c, base B = max(key)+1 from the source):
  customer.c_custkey  += c*B        events.event_id/user_id += c*B
  orders.o_orderkey   += c*B_o      documents.doc_id        += c*B
  orders.o_custkey    += c*B_c      embeddings.vec_id       += c*B
  lineitem.l_orderkey += c*B_o

documents.text gets a per-copy suffix token so replicas are near-dups
(≈ the boilerplate-duplication growth a real corpus shows at scale)
rather than degenerate exact-identical minhash families.

Usage: python tools/scale_replica.py [N] [src_dir] [out_dir] [hot_frac] [tables]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py

``tables`` (comma list, default all facts) restricts WHICH fact tables
get the N× treatment; the rest are written at 1×. The r6 100× study
scales only the document axis (documents,embeddings — 500k docs / 2M
vectors) without materializing a 600M-row lineitem nobody queries.

With ``hot_frac`` (e.g. 0.3), that fraction of events rows is remapped
to ONE hot user id after replication — the skewed-key stress shape
(one customer generating a third of all traffic) that exercises AQE
skew-join splitting and the salted-join operators at scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.session import get_session

DIMS = ("region", "nation", "supplier", "part")
FACTS = ("customer", "orders", "lineitem", "events", "documents", "embeddings")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scaled_x{n}"
    hot_frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    scaled = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else set(FACTS)
    assert scaled <= set(FACTS), f"unknown tables: {scaled - set(FACTS)}"
    spark = get_session("scale_replica")

    def base(table: str, key: str) -> int:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        return int(df.agg(F.max(key)).head()[0]) + 1

    b_cust = base("customer", "c_custkey")
    b_ord = base("orders", "o_orderkey")
    b_evt = base("events", "event_id")
    b_doc = base("documents", "doc_id")
    b_vec = base("embeddings", "vec_id")

    copies = spark.range(n).select(F.col("id").alias("copy"))
    offsets = {
        "customer": {"c_custkey": b_cust},
        "orders": {"o_orderkey": b_ord, "o_custkey": b_cust},
        "lineitem": {"l_orderkey": b_ord},
        "events": {"event_id": b_evt, "user_id": b_cust},
        "documents": {"doc_id": b_doc},
        "embeddings": {"vec_id": b_vec},
    }

    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t in FACTS:
        if t not in scaled:
            spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
            print(f"{t}: x1 copied")
            continue
        df = spark.read.parquet(f"{src}/{t}.parquet").crossJoin(F.broadcast(copies))
        for col, b in offsets[t].items():
            df = df.withColumn(col, F.col(col) + F.col("copy") * F.lit(b))
        if t == "documents":
            # near-dup families, not exact-identical replicas
            df = df.withColumn(
                "text",
                F.when(F.col("copy") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("copy").cast("string"))
                ),
            )
        if t == "embeddings":
            # roll each vector by `copy` positions: intra-copy pairwise
            # cosines are rotation-invariant (the x1 near-dup pair set
            # replicates exactly N×, linear output growth), while
            # cross-copy pairs decorrelate — without this every vector
            # gains N-1 exact duplicates and dedup output grows
            # quadratically in N, drowning the slope measurement
            dim = F.size("embedding")
            # shift in [1, dim-1] for every copy > 0: a plain copy % dim
            # would give shift 0 whenever copy is a multiple of dim —
            # exact duplicates of copy 0, i.e. the quadratic dedup-output
            # degeneracy this roll exists to prevent
            sh = F.lit(1) + (F.col("copy") - 1) % (dim - 1)
            df = df.withColumn(
                "embedding",
                F.when(F.col("copy") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), sh + 1, dim - sh),
                        F.slice(F.col("embedding"), F.lit(1), sh),
                    )
                ),
            )
        if t == "events" and hot_frac > 0.0:
            # deterministic: every event whose id hashes into the hot
            # fraction reports user_id=1 (an existing customer key)
            df = df.withColumn(
                "user_id",
                F.when(
                    (F.abs(F.xxhash64("event_id")) % 1000) < int(hot_frac * 1000),
                    F.lit(1).cast("long"),
                ).otherwise(F.col("user_id")),
            )
        df.drop("copy").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{n} written")
    print(out)


if __name__ == "__main__":
    main()
