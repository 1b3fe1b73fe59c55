"""Custom stateful streaming op (applyInPandasWithState), salted-join
skew handling, and IVF ANN recall."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.similarity import cosine_topk, ivf_topk
from gomaxscale_spark.operators.skew import key_histogram, salted_join
from gomaxscale_spark.streaming.stateful import running_totals


def test_running_totals_stateful_stream(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("user_id", "value", "event_id")
    path = str(tmp_path / "ev")
    events.repartitionByRange(6, "event_id").sortWithinPartitions("event_id").write.mode(
        "overwrite"
    ).parquet(path)
    for i, f in enumerate(sorted(glob.glob(f"{path}/part-*"))):
        os.utime(f, (1_700_000_000 + i * 60,) * 2)

    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update-mode memory sink appends every per-batch emission: the last
    # emission per key must equal the batch aggregate
    import pandas as pd

    out = spark.sql("SELECT * FROM running_out").toPandas()
    final = out.groupby("user_id").last()
    expected = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total"),
            F.expr("max_by(value, event_id)").alias("last_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert len(final) == len(expected)
    for uid, row in expected.iterrows():
        got = final.loc[uid]
        assert int(got["n_events"]) == int(row["n_events"])
        assert abs(float(got["total"]) - float(row["total"])) < 1e-6
        assert float(got["last_value"]) == float(row["last_value"])


def test_salted_join_equals_plain_join(spark):
    # heavy skew: key 0 holds half the fact rows
    fact = spark.createDataFrame(
        [(0 if i % 2 == 0 else i % 50, float(i)) for i in range(10_000)], "k int, v double"
    )
    dim = spark.createDataFrame([(i, f"dim_{i}") for i in range(50)], "k int, name string")

    plain = (
        fact.join(dim, "k")
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    salted = (
        salted_join(fact, dim, "k", n_salts=8)
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s"))
    )
    p = {(r.k, r.name): (r.n, r.s) for r in plain.collect()}
    s = {(r.k, r.name): (r.n, r.s) for r in salted.collect()}
    assert p == s


def test_salted_join_hot_keys_only(spark):
    fact = spark.createDataFrame([(i % 10, i) for i in range(1000)], "k int, v long")
    dim = spark.createDataFrame([(i, str(i)) for i in range(10)], "k int, name string")
    plain = sorted((r.k, r.v) for r in fact.join(dim, "k").select("k", "v").collect())
    salted = sorted(
        (r.k, r.v)
        for r in salted_join(fact, dim, "k", n_salts=4, hot_keys=[0, 1]).select("k", "v").collect()
    )
    assert plain == salted


def test_key_histogram_orders_heaviest_first(spark):
    df = spark.createDataFrame([(0,)] * 50 + [(1,)] * 10 + [(2,)] * 3, "k int")
    hist = key_histogram(df, "k").collect()
    assert [(r.k, r.n_rows) for r in hist] == [(0, 50), (1, 10), (2, 3)]


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    exact = [r.vec_id for r in cosine_topk(e, qv, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(e, qv, k=10, n_centroids=8, n_probe=4).collect()]
    # probing half the lists must recover a majority of the true top-10
    overlap = len(set(exact) & set(approx))
    assert overlap >= 5, f"IVF recall too low: {overlap}/10"
    assert approx[0] == 0  # the query vector itself lives in a probed list


# ------------------------------------------------- salted snapshot fold

def _snapshot_inputs(spark, sf_dir, skew: bool):
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "error", "delete").otherwise("insert").alias("op"),
    )
    if skew:
        # the 30% single-key replica transform (tools/scale_replica.py):
        # ~30% of events collapse onto user_id 1
        e = e.withColumn(
            "user_id",
            F.when(
                (F.abs(F.xxhash64("event_id")) % 1000) < 300, F.lit(1).cast("long")
            ).otherwise(F.col("user_id")),
        )
    return e


@pytest.mark.parametrize("skew", [False, True])
def test_salted_snapshot_equals_window_form(spark, sf_dir, skew):
    from gomaxscale_spark.operators.snapshot import (
        materialize_snapshot,
        materialize_snapshot_salted,
    )

    e = _snapshot_inputs(spark, sf_dir, skew)
    kwargs = dict(
        key_cols=["user_id"], order_cols=["ts_us", "event_id"], event_type_col="op"
    )
    window_form = materialize_snapshot(e, **kwargs).orderBy("user_id").collect()
    salted_form = materialize_snapshot_salted(e, **kwargs).orderBy("user_id").collect()
    assert window_form == salted_form
    assert len(window_form) > 0


def test_salted_snapshot_plan_has_no_window_node(spark, sf_dir):
    from gomaxscale_spark.operators.snapshot import materialize_snapshot_salted

    e = _snapshot_inputs(spark, sf_dir, skew=True)
    plan = materialize_snapshot_salted(
        e, key_cols=["user_id"], order_cols=["ts_us", "event_id"], event_type_col="op"
    )._jdf.queryExecution().executedPlan().toString()
    # per-key Window = the unsplittable straggler under single-key skew;
    # the salted fold must be pure (partial) aggregation
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


# ------------------------------------------------- salted domain cap

def _domain_cap_inputs(spark, sf_dir, skew: bool):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    if skew:
        # 30% of docs collapse onto one hot crawl domain
        d = d.withColumn(
            "source",
            F.when(
                (F.abs(F.xxhash64("doc_id")) % 1000) < 300, F.lit("hot.example.com")
            ).otherwise(F.col("source")),
        )
    return d


@pytest.mark.parametrize("skew", [False, True])
def test_salted_domain_cap_equals_window_form(spark, sf_dir, skew):
    """domain_cap_salted ≡ the per-key window top-K, with and without
    a 30%-hot-key transform (VERDICT r8 item 3: the rank order is
    total, so the salted two-phase selection is exact)."""
    from pyspark.sql import Window as W

    from gomaxscale_spark.operators.sampling import domain_cap_salted

    d = _domain_cap_inputs(spark, sf_dir, skew)
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    )
    window_form = (
        d.select("doc_id", "source", "n_chars", rnk.alias("rnk"))
        .filter(F.col("rnk") <= 15)
        .drop("rnk")
        .orderBy("source", "doc_id")
        .collect()
    )
    salted_form = (
        domain_cap_salted(d, "source", "n_chars", "doc_id", k=15)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert window_form == salted_form
    assert len(window_form) > 0


def test_salted_domain_cap_plan_has_no_per_key_window(spark, sf_dir):
    """The only Window in the plan ranks within (source, salt) — a hot
    key spreads over n_salts tasks; the per-key merge is a bounded
    aggregation, never a per-source window over the full input."""
    from gomaxscale_spark.operators.sampling import domain_cap_salted

    d = _domain_cap_inputs(spark, sf_dir, skew=True)
    plan = (
        domain_cap_salted(d, "source", "n_chars", "doc_id", k=15)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(windows) == 1, plan
    assert "__salt" in windows[0], windows[0]


def test_salted_domain_cap_nan_null_quality_matches_window(spark, sf_dir):
    """NaN quality (zero-norm cosine scores reach this operator via
    IVFIndex.probe_batch / the batched top-k) ranks FIRST and NULL
    quality ranks LAST in BOTH phases — row-identical to the window
    form's desc(quality) total order (ADVICE r9 medium: the earlier
    negated-quality merge key inverted NaN/NULL between the phases,
    so a salt whose partial top-K filled with NaN rows discarded real
    rows phase 2 would have ranked ahead of them)."""
    from pyspark.sql import Window as W

    from gomaxscale_spark.operators.sampling import domain_cap_salted

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    m = F.abs(F.xxhash64("doc_id")) % 10
    d = d.withColumn(
        "q",
        F.when(m == 0, F.lit(float("nan")))
        .when(m == 1, F.lit(None).cast("double"))
        .otherwise(F.col("n_chars").cast("double")),
    )

    def norm(rows):
        import math

        out = []
        for r in rows:
            q = r["q"]
            if q is None:
                q = "NULL"
            elif math.isnan(q):
                q = "NaN"
            out.append((r["doc_id"], r["source"], q))
        return out

    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("q"), F.col("doc_id"))
    )
    window_form = (
        d.select("doc_id", "source", "q", rnk.alias("rnk"))
        .filter(F.col("rnk") <= 5)
        .drop("rnk")
        .orderBy("source", "doc_id")
        .collect()
    )
    salted_form = (
        domain_cap_salted(d, "source", "q", "doc_id", k=5)
        .orderBy("source", "doc_id")
        .collect()
    )
    assert norm(window_form) == norm(salted_form)
    # NaN really reached the selection (desc ranks NaN first)
    assert "NaN" in {x[2] for x in norm(window_form)}

    # deterministic micro-frame forcing ALL THREE classes into the
    # top-5 of one key: desc order = NaN(ids asc) > reals desc > NULL
    nan = float("nan")
    tiny = spark.createDataFrame(
        [(1, "k", nan), (2, "k", 7.0), (3, "k", nan), (4, "k", None),
         (5, "k", 9.0), (6, "k", None)],
        "doc_id int, source string, q double",
    )
    got = norm(
        domain_cap_salted(tiny, "source", "q", "doc_id", k=5)
        .orderBy("doc_id")
        .collect()
    )
    assert got == [
        (1, "k", "NaN"), (2, "k", 7.0), (3, "k", "NaN"),
        (4, "k", "NULL"), (5, "k", 9.0),
    ]
