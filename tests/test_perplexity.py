"""Hashed bigram-LM perplexity scoring semantics (CCNet-style filter).
Oracle parity runs in the catalog replay; these pin the model behavior
and the broadcast-only plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomaxscale_spark.operators import text as TX


def _score(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    return df, TX.bigram_logprob_micro(df, "doc_id", "text", F.col("src") == "ref")


def test_in_domain_docs_score_higher(spark):
    rows = []
    for i in range(30):  # reference corpus: narrow, repetitive domain
        rows.append((i, "the cat sat on the mat and the dog sat too", "ref"))
    rows.append((100, "the cat sat on the mat", "raw"))          # in-domain
    rows.append((101, "zq xv qqj kzw vvx pqr jjz wq", "raw"))    # gibberish
    _, s = _score(spark, rows)
    got = {r["doc_id"]: r["avg_logprob"] for r in s.collect()}
    assert got[100] > got[101], got
    # in-domain doc scores close to the reference docs themselves
    assert abs(got[100] - got[0]) < abs(got[101] - got[0])


def test_bigram_count_and_short_doc_guard(spark):
    rows = [(1, "a b c d", "ref"), (2, "only", "raw"), (3, "x y", "raw")]
    _, s = _score(spark, rows)
    got = {r["doc_id"]: r["n_bigrams"] for r in s.collect()}
    assert got[1] == 3 and got[3] == 1
    assert 2 not in got  # single-token doc has no bigrams → no row


def test_micro_nat_sum_matches_quantized_terms(spark):
    """lp_micro must equal the exact integer sum of per-bigram
    quantized log-probs (recomputed in pure Python)."""
    import hashlib
    import math

    rows = [(1, "u v u v u", "ref"), (2, "u v w", "raw")]
    df, s = _score(spark, rows)
    got = {r["doc_id"]: (r["n_bigrams"], r["lp_micro"]) for r in s.collect()}

    B = 256
    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    docs = {1: "u v u v u".split(), 2: "u v w".split()}
    c2: dict = {}
    c1: dict = {}
    for tks in [docs[1]]:  # reference slice = doc 1
        bs = [bucket(x) for x in tks]
        for a, b in zip(bs, bs[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    for d, tks in docs.items():
        bs = [bucket(x) for x in tks]
        exp = sum(
            round(
                (math.log(c2.get((a, b), 0) + 1) - math.log(c1.get(a, 0) + B)) * 1e6
            )
            for a, b in zip(bs, bs[1:])
        )
        assert got[d] == (len(tks) - 1, exp), (d, got[d], exp)


def test_plan_is_broadcast_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = TX.bigram_logprob_micro(docs, "doc_id", "text", F.col("lang") == "en")
    p = s._jdf.queryExecution().executedPlan().toString()
    assert p.count("BroadcastHashJoin") == 2, p[:1200]
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # the bigram stream shuffles only for the final per-doc aggregation
    exchanges = [seg.splitlines()[0] for seg in p.split("Exchange")[1:]]
    assert all("text" not in e for e in exchanges), exchanges
