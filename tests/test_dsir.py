"""DSIR importance-resampling semantics: the weights must actually
rank target-like documents up, the µ-nat quantization must stay within
its error budget, and the Gumbel resample must be a deterministic
top-k plan. Oracle parity runs in the catalog replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomaxscale_spark.operators import sampling as SA


def _weights(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs, SA.dsir_log_weights(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=4096
    )


def test_weights_rank_target_slice_up(spark, sf_dir):
    docs, w = _weights(spark, sf_dir)
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg(F.col("weight_micro") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    # per-token mean log-ratio: positive-ish for en, below non-en mean
    assert means[True] > means[False], means


def test_resample_skews_toward_target(spark):
    """On a corpus where the target slice has its own vocabulary, the
    resample must overwhelmingly pick target-like docs. (The sf corpora
    share one Zipfian vocabulary across langs, so DSIR correctly finds
    only weak signal there — the mean-rank test above covers that.)"""
    rows = []
    for i in range(40):  # target-like: wiki vocab
        rows.append((i, "science history theory physics atom cell gene " * 4, "wiki"))
    for i in range(40, 200):  # raw crawl: spam vocab
        rows.append((i, "click buy cheap deal offer win prize now " * 4, "crawl"))
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    w = SA.dsir_log_weights(df, "doc_id", "text", F.col("src") == "wiki", n_buckets=512)
    sel = SA.dsir_resample(w, "doc_id", k=50)
    picked = {r["doc_id"] for r in sel.collect()}
    n_target_like = sum(1 for d in picked if d < 40)
    assert n_target_like == 40, n_target_like  # every target-like doc selected


def test_micro_nat_quantization_error_bound(spark, sf_dir):
    """weight_micro/1e6 vs the unquantized float sum: each token
    contributes ≤ 0.5 µnat of rounding error."""
    docs, w = _weights(spark, sf_dir)
    rows = w.collect()
    # recompute unquantized in pure Python from the same counts
    import collections
    import hashlib
    import math

    data = docs.select("doc_id", "text", "lang").collect()
    B = 4096
    rc: collections.Counter = collections.Counter()
    tc: collections.Counter = collections.Counter()
    tokbuk = {}
    def bucket(tok: str) -> int:
        if tok not in tokbuk:
            tokbuk[tok] = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B
        return tokbuk[tok]
    toks_of = {}
    for r in data:
        toks = [x for x in r["text"].split() if x]
        toks_of[r["doc_id"]] = toks
        for tk in toks:
            b = bucket(tk)
            rc[b] += 1
            if r["lang"] == "en":
                tc[b] += 1
    rt, tt = sum(rc.values()), sum(tc.values())
    for r in rows[:50]:
        exact = sum(
            math.log(tc[bucket(tk)] + 1) - math.log(tt + B)
            - math.log(rc[bucket(tk)] + 1) + math.log(rt + B)
            for tk in toks_of[r["doc_id"]]
        )
        assert abs(r["weight_micro"] / 1e6 - exact) <= r["n_tokens"] * 5.1e-7, (
            r["doc_id"], r["weight_micro"] / 1e6, exact
        )


def test_resample_is_deterministic_top_k_plan(spark, sf_dir):
    docs, w = _weights(spark, sf_dir)
    sel = SA.dsir_resample(w, "doc_id", k=100)
    p = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    a = [r["doc_id"] for r in sel.collect()]
    b = [r["doc_id"] for r in SA.dsir_resample(w, "doc_id", k=100).collect()]
    assert a == b and len(a) == 100
