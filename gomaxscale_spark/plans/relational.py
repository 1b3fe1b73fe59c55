"""Relational operator catalog (SURVEY.md §2 Part B, B1-B13).

Every query carries a *Scale* note. Recurring choices:
- dims (region/nation/supplier, O(10..100) rows at any SF) are
  explicitly ``F.broadcast`` — no shuffle for the build side;
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- aggregates are plain hash aggs (map-side partial combine is automatic);
- top-k is ``orderBy().limit()`` → TakeOrderedAndProject (heap per
  partition, merge on driver — never a full global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.asof import asof_join
from .base import query, t


# ---------------------------------------------------------------- B1/B2

@query(
    "scan_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice * 0.8, 2) AS discounted,
           upper(o_orderpriority) AS priority
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    """,
    doc="B1/B2: scan + predicate + projection. Scale: filter and the "
    "4-column ReadSchema push into the parquet scan (verified via "
    "explain — PushedFilters on o_orderstatus/o_totalprice).",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)).select(
        "o_orderkey",
        "o_custkey",
        # ×0.8 not ×0.9: cents×8 never lands on a decimal .xx5 tie, so
        # round(…, 2) agrees bit-for-bit across engines (cents×9 can tie)
        F.round(F.col("o_totalprice") * 0.8, 2).alias("discounted"),
        F.upper("o_orderpriority").alias("priority"),
    )


# ---------------------------------------------------------------- B6 aggs

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)  AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape (flagship agg). Scale: partial-agg map-side, 6 "
    "groups shuffle; dominated by the scan — the plan is one "
    "WholeStageCodegen over the parquet scan.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_stats_per_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*)                              AS n_orders,
           count(DISTINCT o_custkey)             AS n_customers,
           round(sum(o_totalprice), 2)           AS sum_price,
           round(avg(o_totalprice), 2)           AS avg_price,
           round(min(o_totalprice), 2)           AS min_price,
           round(max(o_totalprice), 2)           AS max_price,
           round(stddev_samp(o_totalprice), 2)   AS std_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="B6: the full basic-agg battery incl. exact count-distinct. "
    "Scale: count(distinct) expands to a two-phase agg "
    "(partial per (priority, custkey) then final) — no driver state.",
)
def agg_stats_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("std_price"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS exact_parts,
           TRUE                       AS parts_ok,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE                       AS orders_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B6: approx_count_distinct (HyperLogLog++). Scale: constant "
    "memory per group regardless of cardinality — the 100 TB "
    "replacement for exact count-distinct dashboards. Raw HLL values "
    "differ across engines by design, so the oracle checks the sketch's "
    "CONTRACT instead: |approx − exact| ≤ 3·rsd·exact (rsd = 0.05 "
    "default) must hold — emitted as a boolean next to the exact count "
    "the oracle recomputes. Spark's HLL is deterministic, so the "
    "boolean is stable across runs.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def within(approx, exact):  # 3×rsd relative-error contract
        return (
            F.abs(approx.cast("double") - exact.cast("double")) <= 0.15 * exact.cast("double")
        )

    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__ap"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey").alias("__ao"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        within(F.col("__ap"), F.col("exact_parts")).alias("parts_ok"),
        "exact_orders",
        within(F.col("__ao"), F.col("exact_orders")).alias("orders_ok"),
    )


@query(
    "percentiles_per_status",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
    doc="B6: exact interpolated percentiles. Scale: exact percentile "
    "holds per-group values — at 100 TB swap to approx_percentile "
    "(t-digest, bounded memory); exposed here exact for oracle parity.",
)
def percentiles_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


# ---------------------------------------------------------------- B3 joins

@query(
    "join_inner_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_spent
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="B3 inner equi-join + agg. Scale: both sides shuffle on custkey "
    "(sort-merge or shuffled-hash via AQE); at 100 TB pre-bucketing "
    "both tables on custkey makes this shuffle-free.",
)
def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


@query(
    "join_left_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="B3 left outer join (customers with zero orders kept).",
)
def join_left_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_right_suppliers_per_nation",
    oracle="""
    SELECT n.n_nationkey, n.n_name, count(s.s_suppkey) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
    doc="B3 right outer join (all nations kept).",
)
def join_right_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer_nation_presence",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="B3 full outer join of two aggregates (nations with only "
    "customers / only suppliers surface as NULL sides).",
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk_s, "full").select(
        F.coalesce(c.nk, s.nk_s).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
    doc="B3 left-semi join (EXISTS). Scale: semi-join shuffles only "
    "keys of the right side — no payload duplication.",
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="B3 left-anti join (NOT EXISTS).",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join with dim broadcast. Scale: region/"
    "nation/supplier are broadcast (no shuffle); the two fact joins "
    "shuffle on orderkey/custkey — the canonical star-join plan. The "
    "region filter prunes via the broadcasted dim before the fact scan "
    "finishes (DPP-style at lake scale).",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


# ------------------------------------------------------- B4 range / theta

RANGE_ORACLE = """
    SELECT p.p_partkey, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM part p JOIN events e
      ON e.value >= p.p_size * 10 AND e.value < p.p_size * 10 + 20
    WHERE p.p_size <= 5
    GROUP BY p.p_partkey
"""


@query(
    "range_join_theta",
    oracle=RANGE_ORACLE,
    doc="B4 theta/range join, literal form. Scale: Spark executes this "
    "as BroadcastNestedLoopJoin — correct but O(|small|·|big|); we "
    "broadcast the pre-filtered small side so the big side streams once. "
    "See range_join_bucketed for the 100 TB formulation.",
)
def range_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    e = t(spark, sf_dir, "events")
    cond = (e.value >= p.p_size * 10) & (e.value < p.p_size * 10 + 20)
    return (
        e.join(F.broadcast(p), cond)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "range_join_bucketed",
    oracle=RANGE_ORACLE,
    doc="B4, scale path: bucketize the range key so the band predicate "
    "becomes an equi-join. Each part row expands to its two covering "
    "value-buckets (width 20 == band width); events hash to one bucket; "
    "join on bucket + residual filter. Scale: shuffle-hash join instead "
    "of a nested loop — survives both sides being huge. Same oracle as "
    "range_join_theta (identical semantics). The probe scan is fanned "
    "out first (no-op on multi-partition lake inputs): the band domain "
    "yields few distinct buckets, so join parallelism must come from "
    "the pre-join partitioning, not the join key — measured 1.5 s → "
    "0.65 s at sf0.1.",
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bucketing import parallelize_narrow_input

    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    e = parallelize_narrow_input(t(spark, sf_dir, "events"))
    # band [p_size*10, p_size*10+20) spans exactly two width-20 buckets
    p2 = p.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("p_size") * 10 / 20).cast("long"),
                F.floor((F.col("p_size") * 10 + 19.999999) / 20).cast("long"),
            )
        ),
    ).dropDuplicates(["p_partkey", "bucket"])
    e2 = e.withColumn("bucket", F.floor(F.col("value") / 20).cast("long"))
    cond = (
        (e2.value >= p2.p_size * 10)
        & (e2.value < p2.p_size * 10 + 20)
    )
    return (
        e2.join(p2, "bucket")
        .filter(cond)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "asof_join_purchase_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           arg_max(c.event_id, epoch_us(c.ts)) AS last_click_id,
           max(epoch_us(c.ts)) AS last_click_ts_us
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="B5 as-of join via the union-sort trick (operators/asof.py): "
    "last-click attribution — for each purchase, the user's latest "
    "click at or before it. One shuffle on user_id, window carry-"
    "forward, no L×R fan-out. The oracle states the same semantics as "
    "join+argmax — the plan that does NOT scale (expands every "
    "purchase × prior-click pair). Exact µs longs both sides (DuckDB "
    "truncates the ns parquet to µs, so µs is the comparison domain).",
)
def asof_join_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")  # integer div: double ÷ loses µs at 1e18 ns
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("uid"), "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"), "ts_us", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="uid",
        left_time="ts_us",
        right_time="ts_us",
        payload={"event_id": "last_click_id", "ts_us": "last_click_ts_us"},
        how="inner",
    )
    return joined.select("purchase_id", "last_click_id", "last_click_ts_us")


# ------------------------------------------------- B7 rollup/cube/gsets

@query(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="B7 rollup: hierarchical subtotals + grand total.",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="B7 cube: all grouping combinations. Scale: cube expands each "
    "input row 2^d times pre-shuffle; keep d small or use grouping sets.",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price")
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="B7 grouping sets (SQL API — Catalyst plans it as a single "
    "Expand + one aggregate).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------- B8/B9 windows

@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
    WHERE rk <= 3
    """,
    doc="B8/B9 top-k per group. Scale: one shuffle on the partition key; "
    "rank filter is applied streaming within each sorted partition — "
    "never materializes the full ordering. Ties broken by orderkey.",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0), 2) AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="B8 lag/lead over a deterministic total order (date + key tiebreak).",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2
        ).alias("delta_prev"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           dense_rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderstatus) AS status_dense_rank
    FROM orders
    """,
    doc="B8 running aggregate with an explicit ROWS frame + rank/dense_rank.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_rank = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_dense = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spent"),
        F.rank().over(w_rank).alias("price_rank"),
        F.dense_rank().over(w_dense).alias("status_dense_rank"),
    )


@query(
    "window_ntile_acctbal",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS balance_quartile
    FROM customer
    """,
    doc="B8 ntile quartiles within market segment.",
)
def window_ntile_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select("c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("balance_quartile"))


@query(
    "topn_global_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="B9 global top-N: TakeOrderedAndProject (per-partition heaps, "
    "driver merges 20 rows — no global sort ever materializes).",
)
def topn_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ------------------------------------------------------------- B10 setops

@query(
    "setop_union_all_parties",
    oracle="""
    SELECT c_custkey AS id, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier
    """,
    doc="B10 union all (no dedup shuffle).",
)
def setop_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@query(
    "setop_intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="B10 intersect (customers with both open and finished orders).",
)
def setop_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "setop_except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="B10 except (distinct).",
)
def setop_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


# ------------------------------------------------------------ B11 scalars

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '-', p_type)                 AS brand_type,
           substr(p_name, 1, 8)                         AS name_prefix,
           upper(p_name)                                AS name_upper,
           CAST(length(p_name) AS INTEGER)              AS name_len,
           replace(p_name, 'a', '@')                    AS name_replaced,
           regexp_extract(p_name, '([a-z]+)', 1)        AS first_word,
           lpad(p_brand, 12, '*')                       AS brand_padded,
           trim(concat('  ', p_type, '  '))             AS type_trimmed
    FROM part
    """,
    doc="B11 string functions (all JVM-codegen'd — zero Python).",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", "a", "@").alias("name_replaced"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("type_trimmed"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)     AS order_year,
           CAST(month(o_orderdate) AS INTEGER)    AS order_month,
           CAST(day(o_orderdate) AS INTEGER)      AS order_day,
           CAST(quarter(o_orderdate) AS INTEGER)  AS order_quarter,
           date_trunc('month', o_orderdate)       AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
           o_orderdate + INTERVAL 30 DAY          AS due_date
    FROM orders
    """,
    doc="B11 date/time functions.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "scalar_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.8, 2)              AS discounted_80,
           round(abs(l_discount - 0.05), 4)             AS disc_dev,
           round(ln(l_quantity + 1), 6)                 AS log_qty,
           round(sqrt(l_extendedprice), 6)              AS sqrt_price,
           CAST(ceil(l_quantity) AS BIGINT)             AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
           CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
           round(coalesce(nullif(l_tax, 0), -1), 2)     AS tax_or_flag,
           round(greatest(l_discount, l_tax), 2)        AS max_rate,
           round(least(l_discount, l_tax), 2)           AS min_rate
    FROM lineitem
    """,
    doc="B11 math + conditional functions.",
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.8, 2).alias("discounted_80"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.when(F.col("l_discount") > 0.05, "HIGH").otherwise("LOW").alias("disc_band"),
        F.round(F.coalesce(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(-1.0)), 2).alias(
            "tax_or_flag"
        ),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
    )


# ---------------------------------------------------------- B12/B13 json+arrays

@query(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n, round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="B12 JSON extraction — the reference's RawData pattern "
    "(types.go:181-190): payload rides as a raw JSON string, projected "
    "on demand. get_json_object is JVM-side (Jackson), no Python.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@query(
    "json_typed_projection",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
    doc="B12/C3 typed payload projection: from_json with an explicit "
    "schema (the DDL-registry path) then filter on the typed field.",
)
def json_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    return parsed.filter(F.col("k") > 90)


@query(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                  AS dim,
           CAST(embedding[1] AS DOUBLE)                     AS first_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS elem_sum,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS elem_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
    doc="B13 array higher-order functions over array<float> — size, "
    "index, fold (aggregate), max, filter — all codegen, no UDFs.",
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("elem_sum"),
        F.array_max(emb).cast("double").alias("elem_max"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "explode_word_frequencies",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
          FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="B13 explode/unnest + frequency count, top 20 deterministic. "
    "Scale: explode fans out pre-shuffle; partial aggregation collapses "
    "per-partition counts before the (tiny-keyspace) shuffle.",
)
def explode_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1
    """,
    doc="B13-adjacent: pivot (explicit value list keeps the plan a "
    "single agg — never let pivot infer values with a distinct scan "
    "at 100 TB).",
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    out = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out


@query(
    "schema_evolution_union_by_name",
    oracle="""
    SELECT p_partkey, p_name, p_size FROM part WHERE p_partkey % 2 = 0
    UNION ALL BY NAME
    SELECT p_partkey, p_name, p_retailprice, p_brand FROM part WHERE p_partkey % 2 = 1
    """,
    doc="C4 schema-version evolution: two schema versions of the same "
    "logical table merged with unionByName(allowMissingColumns=True) — "
    "the reference's DDL Version bump (types.go:36) re-expressed.",
)
def schema_evolution_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    v1 = p.filter(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_name", "p_size")
    v2 = p.filter(F.col("p_partkey") % 2 == 1).select(
        "p_partkey", "p_name", "p_retailprice", "p_brand"
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    doc="TPC-H Q3 shape: selective dim filter → two fact joins → agg. "
    "Scale: the c_mktsegment filter reduces customer ~5× before the "
    "join; both fact joins shuffle on their keys; Catalyst pushes both "
    "date predicates into the scans.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — the pushdown "
    "benchmark. Scale: every predicate reaches the parquet reader "
    "(row-group pruning on shipdate); no shuffle beyond the 1-row agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "map_funcs_props",
    oracle="""
    SELECT event_id,
           2 AS n_keys,
           event_type AS type_val,
           CAST(user_id % 5 AS VARCHAR) AS bucket_val
    FROM events
    """,
    doc="B13 map functions: build map<string,string> from columns, read "
    "it back via element_at/map_keys. The oracle checks the round-trip "
    "values (map internals are engine-specific).",
)
def map_funcs_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), (F.col("user_id") % 5).cast("string"),
    )
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "bucket").alias("bucket_val"),
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
    """,
    doc="B13-adjacent unpivot/melt (wide → long) via the native unpivot "
    "operator — an Expand node, no shuffle, no UDF.",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")


@query(
    "subquery_above_nation_avg",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey, round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="B2/B6 correlated scalar subquery (SQL API): Catalyst de-"
    "correlates it into an aggregate + join — no per-row re-execution, "
    "unlike a naive nested-loop interpretation. The decorrelation IS "
    "the scale story.",
)
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("__cust_sq")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey, round(c.c_acctbal, 2) AS acctbal
        FROM __cust_sq c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM __cust_sq c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="B10 exceptAll (bag semantics — multiplicity-aware).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="B10 intersectAll (bag semantics).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


@query(
    "histogram_event_values",
    oracle="""
    SELECT least(CAST(floor(value / 25.0) AS BIGINT), 19) AS bucket,
           count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM events GROUP BY 1
    """,
    doc="B6 numeric histogram via explicit bucket arithmetic (the "
    "portable width_bucket): one hash agg over 20 keys — the profile-"
    "a-column primitive for 100 TB data exploration.",
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0).cast("long"), F.lit(19).cast("long"))
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
           arg_min(event_id, ts) AS first_event_id,
           arg_max(event_id, ts) AS last_event_id
    FROM events GROUP BY user_id
    """,
    doc="B6/B13 collection aggregates: sorted distinct collect_set (the "
    "deterministic form — raw collect order is partition-dependent) "
    "plus min_by/max_by. Scale: collect_* is bounded here by the tiny "
    "per-user type domain; unbounded collects belong in explode-side "
    "processing instead. The set is emitted '|'-joined — the driver's "
    "canonicalizer hashes scalar cells, not arrays.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.expr("min_by(event_id, ts_ns)").alias("first_event_id"),
        F.expr("max_by(event_id, ts_ns)").alias("last_event_id"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B6 approx_percentile (Greenwald-Khanna sketch): bounded memory "
    "per group at any cardinality — the 100 TB replacement for exact "
    "percentiles (percentiles_per_status is the exact twin). Sketch "
    "values differ across engines by design, so the oracle checks the "
    "sketch's rank-error CONTRACT: with accuracy 10000 the returned "
    "element's rank is within n/10000 of the target — far inside the "
    "exact [p−0.01, p+0.01] quantile envelope each boolean asserts. "
    "Spark's GK sketch is deterministic, so the booleans are stable.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("__ap"),
        F.expr("percentile(l_extendedprice, array(0.49, 0.94, 0.98))").alias("__lo"),
        F.expr("percentile(l_extendedprice, array(0.51, 0.96, 1.0))").alias("__hi"),
    )

    def ok(i: int):
        return (F.col("__ap")[i] >= F.col("__lo")[i]) & (F.col("__ap")[i] <= F.col("__hi")[i])

    return agg.select(
        "l_returnflag",
        "n",
        ok(0).alias("p50_ok"),
        ok(1).alias("p95_ok"),
        ok(2).alias("p99_ok"),
    )


@query(
    "scalar_string_extras",
    oracle="""
    SELECT p_partkey,
           reverse(p_name)                       AS name_rev,
           split_part(p_name, ' ', 2)            AS second_word,
           translate(p_brand, '#', '-')          AS brand_dashed,
           left(p_type, 3)                       AS type_left,
           right(p_type, 3)                      AS type_right,
           repeat(p_brand, 2)                    AS brand_twice,
           starts_with(p_name, 'red')            AS is_red,
           ends_with(p_name, 'bolt')             AS is_bolt,
           contains(p_name, 'wid')               AS has_wid
    FROM part
    """,
    doc="B11 string functions, second battery (reverse/split_part/"
    "translate/left/right/repeat/prefix-suffix-contains predicates).",
)
def scalar_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("name_rev"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.substring("p_type", 1, 3).alias("type_left"),
        F.expr("right(p_type, 3)").alias("type_right"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.startswith(F.col("p_name"), F.lit("red")).alias("is_red"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
        F.contains(F.col("p_name"), F.lit("wid")).alias("has_wid"),
    )


@query(
    "scalar_date_extras",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofyear(o_orderdate) AS INTEGER)       AS doy,
           CAST(o_orderdate + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month
    FROM orders
    """,
    doc="B11 date functions, second battery (last_day/dayofyear/"
    "month arithmetic with end-of-month clamping).",
)
def scalar_date_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # date-typed outputs render differently across engines (DATE vs
        # datetime64) — normalize to timestamp on both sides
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")).alias("next_month"),
    )


@query(
    "window_rank_fractions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6)    AS cd,
           first_value(c_custkey) OVER w   AS poorest_custkey,
           last_value(c_custkey) OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="B8 fractional ranks + first_value/last_value with explicit "
    "full frame (the default frame truncates last_value at the current "
    "row — a classic cross-engine trap, avoided identically here).",
)
def window_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("c_custkey").over(w).alias("poorest_custkey"),
        F.last("c_custkey").over(w_full).alias("richest_custkey"),
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue in a "
    "half-year window. Scale: date+flag predicates push to the scans; "
    "nation broadcasts; the orders↔lineitem join shuffles on orderkey "
    "with AQE sizing. Top-20 order key is an exact 4-decimal sum (bit-"
    "stable in double), custkey tie-break → deterministic cutoff.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev, 4).alias("revenue"), rev.alias("__order"))
        .orderBy(F.desc("__order"), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS INTEGER)  AS ship_year,
           CAST(month(l.l_shipdate) AS INTEGER) AS ship_month,
           round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY year(l.l_shipdate), month(l.l_shipdate)
    """,
    doc="TPC-H Q14 shape: promo revenue share per ship month. Scale: "
    "part is the small side → broadcast hash join (no shuffle of "
    "lineitem); both sums are exact 4-decimal values, and their "
    "division is a same-expression IEEE op → bit-identical across "
    "engines at any rounding.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(F.round(F.lit(100.0) * promo / F.sum(rev), 6).alias("promo_share"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           round(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: large-volume orders (sum qty > 150) with their "
    "customers. Scale: the HAVING pre-aggregation shrinks lineitem to "
    "~1/5 of orders BEFORE any join — aggregate-then-join is the "
    "pattern; quantities are small integers stored as double → exact "
    "sums, deterministic threshold.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(var_samp(l_quantity), 6)                    AS var_qty,
           round(stddev_samp(l_extendedprice), 4)            AS std_price,
           round(median(l_quantity), 2)                      AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B6 statistical-moment aggregates: corr / covar_samp / var_samp "
    "/ stddev_samp / median per group — the profiling battery a data-"
    "quality pass runs per column pair. Scale: all are single-pass "
    "partial-aggregatable (co-moment merge), one shuffle of 3 groups × "
    "a handful of moments; median is exact interpolated percentile "
    "(full sort per group — use approx_percentile beyond memory-sized "
    "groups, cf. agg_approx_percentile).",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.median("l_quantity"), 2).alias("median_qty"),
    )


@query(
    "agg_bitwise_bool",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS uid_and,
           bit_or(user_id)  AS uid_or,
           bit_xor(user_id) AS uid_xor,
           bool_and(value > 0)   AS all_positive,
           bool_or(value > 400)  AS any_large
    FROM events GROUP BY event_type
    """,
    doc="B6 bitwise / boolean aggregates: bit_and/bit_or/bit_xor + "
    "bool_and/bool_or per group — flag-mask folding and invariant "
    "checks (e.g. 'every event in the partition passed validation'). "
    "All trivially partial-aggregatable → map-side combine, tiny "
    "shuffle.",
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("uid_and"),
        F.bit_or("user_id").alias("uid_or"),
        F.bit_xor("user_id").alias("uid_xor"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
    )


@query(
    "window_time_range_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2)
               AS rolling_1h_sum,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS rolling_1h_n
    FROM events
    """,
    doc="B8 time-RANGE window frames: per-user rolling 1-hour sum/count "
    "over event time — the 'activity in the trailing hour' shape that "
    "rows-frames can't express (frame bounds are values, not row "
    "offsets). Ordered on exact epoch micros so both engines bound the "
    "frame identically in the µs domain. Scale: one shuffle on "
    "user_id, sort within partitions; RANGE frames stream in a single "
    "pass per partition.",
)
def window_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_n"),
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderpriority, 'LOW')                       AS prio_or_null,
           coalesce(nullif(o_orderpriority, 'LOW'), 'DEMOTED')  AS prio_defaulted,
           CASE WHEN nullif(o_orderpriority, 'LOW') IS NULL
                THEN 0 ELSE 1 END                               AS has_prio,
           nullif(o_orderpriority, 'LOW') IS NOT DISTINCT FROM 'HIGH'
                                                                AS null_safe_is_high
    FROM orders
    """,
    doc="B11 null-semantics battery: nullif / coalesce / null-safe "
    "equality (Spark <=> ≡ SQL IS NOT DISTINCT FROM) — the operators "
    "that keep three-valued logic from silently dropping rows in "
    "filters and joins. Pure map.",
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    prio_or_null = F.nullif(F.col("o_orderpriority"), F.lit("LOW"))
    return o.select(
        "o_orderkey",
        prio_or_null.alias("prio_or_null"),
        F.coalesce(prio_or_null, F.lit("DEMOTED")).alias("prio_defaulted"),
        F.when(prio_or_null.isNull(), F.lit(0)).otherwise(F.lit(1)).alias("has_prio"),
        prio_or_null.eqNullSafe(F.lit("HIGH")).alias("null_safe_is_high"),
    )


@query(
    "sql_api_sales_by_region",
    oracle="""
    SELECT r.r_name, count(DISTINCT c.c_custkey) AS n_customers,
           round(sum(o.o_totalprice), 2) AS total_sales
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name
    """,
    doc="The SQL entry point: the engine's tables registered as views "
    "and queried through spark.sql() with ANSI SQL — proving the "
    "second API surface next to the DataFrame one (same Catalyst plan "
    "either way; region/nation broadcast, one shuffle on custkey).",
)
def sql_api_sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name, count(DISTINCT c.c_custkey) AS n_customers,
               round(sum(o.o_totalprice), 2) AS total_sales
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        GROUP BY r.r_name
        """
    )


@query(
    "join_salted_skew_equivalence",
    oracle="""
    SELECT n.n_name, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    doc="Skew tooling in the gate: the fact↔dim join runs through "
    "salted_join (operators/skew.py — fact keys spread over 8 salts, "
    "dim exploded to match) and must produce EXACTLY the plain-join "
    "aggregate. Salting is the explicit fix when one key owns a "
    "double-digit share of a 100 TB fact table and AQE's skew split "
    "isn't enough (reduce-side aggs, severe skew).",
)
def join_salted_skew_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    e = t(spark, sf_dir, "events").withColumnRenamed("user_id", "c_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    joined = salted_join(e, c, on="c_custkey", n_salts=8)
    return (
        joined.join(F.broadcast(n), joined["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "scalar_try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN round(value) = 0 THEN NULL
                ELSE value / round(value) END                AS try_div,
           round(value, 2) + 9223372036854775807 * 0         AS safe_add,
           CASE WHEN round(value) = 0 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) % CAST(round(value) AS BIGINT)
                END                                          AS try_mod
    FROM events
    """,
    doc="B11 ANSI-safe arithmetic: Spark 4 runs in ANSI mode (division "
    "by zero / overflow are runtime errors, not silent NULLs/wraps) — "
    "the try_* family opts individual expressions back into NULL-on-"
    "error, the right default for dirty pipeline data. The oracle "
    "states the equivalent guarded CASE arithmetic.",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    rv = F.round(F.col("value"))
    return e.select(
        "event_id",
        # no round: the quotient is the same IEEE double on both engines,
        # and round(±, 6) would tie on the exactly-7-decimal quotients
        # that power-of-two denominators produce (e.g. 32.23/32)
        F.try_divide(F.col("value"), rv).alias("try_div"),
        (F.round(F.col("value"), 2) + F.lit(9223372036854775807) * F.lit(0)).alias("safe_add"),
        F.try_mod(F.round(F.col("value") * 100).cast("long"), rv.cast("long")).alias("try_mod"),
    )


@query(
    "sql_correlated_min_price",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                           FROM part p2 WHERE p2.p_brand = part.p_brand)
    """,
    doc="TPC-H Q2 shape: correlated scalar subquery — the cheapest part "
    "per brand, every tie returned (deterministic, no float cutoff). "
    "Catalyst decorrelates this into an aggregate + join, the plan a "
    "hand-writer would build; at scale that's one shuffle on the "
    "correlation key. Exercises the SQL parser path for correlated "
    "subqueries next to the DSL catalog.",
)
def sql_correlated_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                               FROM part p2 WHERE p2.p_brand = part.p_brand)
        """
    )


@query(
    "dq_referential_orphans",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           count(*) AS n_violations
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitems_without_order' AS check_name,
           count(*) AS n_violations
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'events_user_not_customer' AS check_name,
           count(*) AS n_violations
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    WHERE c.c_custkey IS NULL
    """,
    doc="Data-quality gate, referential integrity: orphan counts across "
    "the star schema's foreign keys — the validation pass a training "
    "pipeline runs before trusting joins. Scale: each check is an "
    "anti-join counted with map-side partials; dimension sides "
    "broadcast, fact sides never materialize the orphan rows.",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphans(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    e = t(spark, sf_dir, "events")
    return (
        orphans("orders_without_customer", o, "o_custkey", c, "c_custkey")
        .unionAll(orphans("lineitems_without_order", li, "l_orderkey", o, "o_orderkey"))
        .unionAll(orphans("events_user_not_customer", e, "user_id", c, "c_custkey"))
    )


@query(
    "dq_column_profile",
    oracle="""
    SELECT 'o_totalprice' AS col_name,
           count(*) AS n_rows,
           count(o_totalprice) AS n_non_null,
           round(min(o_totalprice), 2) AS min_val,
           round(max(o_totalprice), 2) AS max_val,
           count(DISTINCT o_totalprice) AS n_distinct,
           CAST(count(CASE WHEN o_totalprice < 0 THEN 1 END) AS BIGINT)
               AS n_range_violations
    FROM orders
    UNION ALL
    SELECT 'value', count(*), count(value),
           round(min(value), 2), round(max(value), 2),
           count(DISTINCT value),
           CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT)
    FROM events
    """,
    doc="Data-quality gate, column profiling: completeness (null "
    "counts), range, cardinality, constraint violations per column — "
    "single-pass aggregates, one reduce to one row per column. The "
    "per-column profile a pipeline records per ingest batch.",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def profile(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.round(F.min(col), 2).alias("min_val"),
            F.round(F.max(col), 2).alias("max_val"),
            F.countDistinct(col).alias("n_distinct"),
            F.count(F.when(F.col(col) < 0, F.lit(1))).alias("n_range_violations"),
        ).select(
            "col_name", "n_rows", "n_non_null", "min_val", "max_val",
            "n_distinct", "n_range_violations",
        )

    o = t(spark, sf_dir, "orders")
    e = t(spark, sf_dir, "events")
    return profile(o, "o_totalprice").unionAll(profile(e, "value"))


@query(
    "window_zscore_builtin",
    oracle="""
    WITH g AS (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 2)
    SELECT e.user_id, e.event_id,
           round((e.value - avg(e.value) OVER (PARTITION BY e.user_id))
                 / stddev_samp(e.value) OVER (PARTITION BY e.user_id), 6) AS zscore
    FROM events e JOIN g ON g.user_id = e.user_id
    """,
    doc="B8 built-in twin of udf_grouped_zscore (same oracle): per-user "
    "z-score as pure window expressions — no Python workers, stays "
    "inside whole-stage codegen. This is the bench-headline slot; the "
    "applyInPandas variant remains in the catalog as the B18 surface "
    "proof. Scale: one shuffle on user_id, window aggregates computed "
    "in a single pass per partition.",
)
def window_zscore_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    stats = e.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.avg("value").over(w).alias("__mean"),
        F.stddev_samp("value").over(w).alias("__sd"),
    ).filter(F.col("__n") >= 2)
    return stats.select(
        "user_id",
        "event_id",
        F.round((F.col("value") - F.col("__mean")) / F.col("__sd"), 6).alias("zscore"),
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
    SELECT r.r_name,
           count(DISTINCT c.c_custkey) AS exact_customers,
           TRUE AS estimate_ok
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
    doc="B6: MERGEABLE distinct-count sketches (Apache DataSketches HLL "
    "via hll_sketch_agg / hll_union_agg / hll_sketch_estimate). "
    "Two-level rollup: per-nation sketches built in one scan, then "
    "unioned into per-region estimates WITHOUT rescanning customers — "
    "the sketches-as-state pattern behind 100 TB distinct-count "
    "dashboards (persist per-partition/day sketches once; answer any "
    "rollup by merging kilobyte sketches). The estimate is checked "
    "against the exact count via the sketch's error contract "
    "(lgConfigK=12 → rsd ≈ 1.6%; asserted bound 5%) — Spark's "
    "DataSketches build is deterministic, so the boolean is stable. "
    "Exact twin rides along: custkeys partition across nations, so the "
    "per-nation exact distinct counts SUM to the region value the "
    "oracle recomputes.",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    per_nation = joined.groupBy("r_name", "n_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_n"),
    )
    per_region = per_nation.groupBy("r_name").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("__est"),
        F.sum("exact_n").alias("exact_customers"),
    )
    return per_region.select(
        "r_name",
        "exact_customers",
        (
            F.abs(F.col("__est").cast("double") - F.col("exact_customers").cast("double"))
            <= 0.05 * F.col("exact_customers").cast("double")
        ).alias("estimate_ok"),
    )


@query(
    "agg_approx_topk_priorities",
    oracle="""
    SELECT o_orderpriority AS item, count(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
    doc="B6: approx_top_k (DataSketches frequent-items, Spark 4). The "
    "priority domain (5 values) sits under maxItemsTracked=100, so the "
    "sketch is EXACT here and the oracle is the plain group count; at "
    "real 100 TB cardinality the identical plan returns heavy hitters "
    "with bounded error from one scan + constant-size state — the "
    "streaming-friendly replacement for ORDER BY count(*) LIMIT k over "
    "an unbounded key space. Output exploded to rows (driver compares "
    "order-insensitively — tie order inside the sketch array is "
    "implementation-defined).",
)
def agg_approx_topk_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    tk = o.agg(F.expr("approx_top_k(o_orderpriority, 5, 100)").alias("tk"))
    return tk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_bar
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_bar
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity) folded into a join — the decorrelation Catalyst performs "
    "on the textbook formulation, written directly. Scale: the per-part "
    "aggregate is partial-agg'd map-side to one row per partkey and "
    "joins back on the fact's own key, so at 100 TB the heavy side "
    "shuffles once on l_partkey and the brand filter prunes `part` "
    "before its broadcast.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    qty = li.groupBy(F.col("l_partkey").alias("qb_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_bar")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(qty, li.l_partkey == qty.qb_partkey)
        .filter(F.col("l_quantity") < F.col("qty_bar"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 120
    )
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: groupBy-HAVING membership (big-quantity "
    "orders) driving a semi-join back into the fact. Scale: the HAVING "
    "aggregate reuses the fact's l_orderkey partitioning; the semi-join "
    "ships only surviving orderkeys (a left-semi hash join, broadcast "
    "when the hot-order set is small — the common case at any scale "
    "because HAVING prunes hard).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 120)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@query(
    "agg_regression_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B6: bivariate statistical aggregate battery — corr, covar_pop, "
    "regr_slope/intercept/count per group, the same single-pass "
    "moment-sketch family as stddev/var. Scale: all five are "
    "partial-aggregable (sum/sum-of-products moments), so the shuffle "
    "carries one moment tuple per (partition × group) — identical "
    "shape to any groupBy sum at 100 TB.",
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias("intercept"),
        F.expr("regr_count(l_extendedprice, l_quantity)").alias("n"),
    )


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             round(sum(value), 2) AS hourly_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly
    ), grid AS (
      SELECT t.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds) g
    )
    SELECT g.event_type, g.hr, h.hourly_value,
           last_value(h.hourly_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON h.event_type = g.event_type AND h.hr = g.hr
    """,
    doc="Time-series gap filling: build the dense hourly grid per "
    "series (sequence over the in-plan min/max bounds × distinct "
    "keys), left-join the sparse aggregates, forward-fill holes with "
    "last_value(ignoreNulls). The standard resample→ffill shape for "
    "sensor/metric tables. Scale: bounds are a 1-row broadcast and the "
    "grid is keys × hours (tiny vs the fact); the fact aggregates "
    "partial-agg map-side; the fill is one window per series — hours "
    "within a series are dense so the window never skews. Hour sums "
    "round(2) per the double-sum rounding rule.",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr("(ts_ns div 1000) div 3600000000").alias("hr"),
    ).agg(F.round(F.sum("value"), 2).alias("hourly_value"))
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    )
    joined = grid.join(F.broadcast(hourly), ["event_type", "hr"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        "hr",
        "hourly_value",
        F.last("hourly_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "dq_contract_violations",
    oracle="""
    SELECT 'event_type_domain' AS rule,
           CAST(sum(CASE WHEN event_type NOT IN
               ('click','view','purchase','error','signup') THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           count(*) AS checked
    FROM events
    UNION ALL
    SELECT 'value_non_negative',
           CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT), count(*)
    FROM events
    UNION ALL
    SELECT 'ts_in_2024',
           CAST(sum(CASE WHEN epoch_us(ts) < 1704067200000000
                     OR epoch_us(ts) >= 1735689600000000 THEN 1 ELSE 0 END) AS BIGINT),
           count(*)
    FROM events
    UNION ALL
    SELECT 'props_is_json_object',
           CAST(sum(CASE WHEN props IS NOT NULL
                     AND json_valid(props) AND json_type(props) = 'OBJECT'
               THEN 0 ELSE 1 END) AS BIGINT),
           count(*)
    FROM events
    """,
    doc="DQ data-contract gate: declarative rule battery (enum domain, "
    "range, event-time bounds, payload well-formedness) evaluated as "
    "one scan with conditional-sum aggregates — each rule is a "
    "violation count, so a healthy table returns all zeros and the "
    "query doubles as a CI assertion. The enum rule is the Spark "
    "rendition of the reference's DDL enum symbols "
    "(types.go:159-162) as a checkable domain. Scale: one pass, "
    "partial-agg'd conditional sums, no shuffle beyond the 1-row "
    "rollups; the UNION ALL arms share the cached scan.",
)
def dq_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")

    def rule(name: str, bad) -> DataFrame:
        return e.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("violations"),
            F.count(F.lit(1)).alias("checked"),
        )

    domain = ~F.col("event_type").isin("click", "view", "purchase", "error", "signup")
    neg = F.col("value") < 0
    ts_oob = (us < 1704067200000000) | (us >= 1735689600000000)
    # null-safe: invalid JSON makes get_json_object NULL, and a bare
    # ~(true & NULL) would be NULL → counted as 0 violations while the
    # DuckDB oracle (json_valid) counts 1. coalesce pins NULL → False
    # before negating, so null props AND malformed props both violate.
    bad_json = ~F.coalesce(
        F.col("props").isNotNull()
        & F.get_json_object("props", "$").startswith("{"),
        F.lit(False),
    )
    return (
        rule("event_type_domain", domain)
        .unionAll(rule("value_non_negative", neg))
        .unionAll(rule("ts_in_2024", ts_oob))
        .unionAll(rule("props_is_json_object", bad_json))
    )


# ------------------------------------------------- TPC-H breadth (r10)
#
# The remaining schema-feasible TPC-H shapes. The driver's testdata is
# TPC-H-LITE (no partsupp table; lineitem lacks commitdate/receiptdate/
# shipmode; customer lacks phone; orders lacks comment), so queries
# whose predicate columns are absent keep their SHAPE — the join
# topology, the subquery class, the aggregation pattern — with the
# predicate swapped to an existing column, and say so in their doc.
# q2/q11/q16/q20 need partsupp and are out of schema reach entirely.

@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS → semi join): orders in a quarter with "
    "at least one slow-shipping line (shipdate > orderdate + 60d — the "
    "commitdate/receiptdate lateness test adapted to this schema), "
    "counted by priority. Scale: the semi join never duplicates orders "
    "however many lines match; both date predicates push into the "
    "scans; the count is a 5-group partial agg.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 (full shape): bilateral trade volume between two "
    "nations by year — two fact joins plus two ALIASED broadcasts of "
    "the same dim (supplier's nation vs customer's nation), the "
    "OR-pair predicate across both roles. Scale: nations broadcast "
    "(the OR prunes to 2 rows per side before the join); the fact "
    "chain shuffles on its keys; the date band pushes into the "
    "lineitem scan.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        s.join(li, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nk") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("c_nk") == c.c_nationkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_5'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY year(o.o_orderdate)
    """,
    doc="TPC-H Q8 (full shape): a nation's market share inside one "
    "region's PROMO-part trade, by order year — the conditional-"
    "aggregate ratio over a five-join snowflake with the nation dim "
    "broadcast twice in different roles (customer region membership "
    "vs supplier identity). Share = same-expression division of two "
    "4-dec-exact sums → 6dp round is engine-stable. Scale: part/dims "
    "broadcast, facts shuffle once each; the region filter prunes the "
    "customer side before the fact join.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("c_nk") == c.c_nationkey, "semi")
        .join(F.broadcast(n2), F.col("s_nk") == s.s_nationkey)
    )
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
            / F.sum(vol),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q9 shape (part-filtered profit by supplier nation and "
    "year): this schema has no partsupp, so profit is gross revenue "
    "(no ps_supplycost term) and the part filter is p_type rather "
    "than p_name LIKE — the four-join topology, the year extraction, "
    "and the (nation, year) rollup are the Q9 shape. Scale: part and "
    "dims broadcast; lineitem shuffles once on l_orderkey.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
    )
    return j.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "profit"
        )
    )


@query(
    "q12_linestatus_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (CASE-split counts of order priorities per "
    "lineitem attribute): this schema has no l_shipmode/commitdate/"
    "receiptdate, so the group key is l_linestatus and the window is "
    "a shipdate year — the join + dual-conditional-count aggregation "
    "is the Q12 shape. Scale: one fact-fact shuffle; the two CASE "
    "sums ride a single partial agg.",
)
def q12_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (full shape): the customer-order-count distribution "
    "— LEFT join (zero-order customers must appear as c_count = 0) "
    "with the filter in the JOIN CONDITION (a WHERE would silently "
    "turn it inner — the classic Q13 trap), then a two-level "
    "aggregation. The o_comment NOT LIKE filter becomes a priority "
    "filter on this schema. Scale: one key shuffle for the join+first "
    "agg, the second agg is ~tens of groups.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 (full shape): the quarter's top supplier(s) — a "
    "revenue aggregation consumed twice (once for the max scalar, "
    "once to match it), the view-plus-scalar-subquery pattern. The "
    "equality compares 4dp-ROUNDED revenues (intrinsically 4-decimal "
    "sums → the round is engine-stable, so the max-match set is too). "
    "Scale: rev is one partial-agg shuffle of the date-pruned scan; "
    "the max reduces supplier-count rows; ties all surface (no "
    "LIMIT 1 masking).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    from ..operators.materialize import materialize_once

    rev = materialize_once(rev)  # consumed twice: max scalar + match
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: revenue under an OR-of-ANDs across BOTH join "
    "sides (brand/size from part, quantity from lineitem; container/"
    "shipmode are absent from this schema so size stands in). The "
    "optimizer must split the disjunction: the part-only arms "
    "(brand ∨ size envelope) push below the join, the cross-side "
    "conjunctions evaluate post-join — a single-row aggregate either "
    "way. Scale: part broadcasts; lineitem scans once.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_nationkey % 5 AS cntry,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ), pos AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS total_cents,
             count(*) AS n_pos
      FROM cust WHERE bal_cents > 0 AND cntry IN (0, 1, 2)
    ), idle AS (
      SELECT c.* FROM cust c
      WHERE c.cntry IN (0, 1, 2)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    )
    SELECT i.cntry,
           count(*) AS numcust,
           round(CAST(sum(i.bal_cents) AS BIGINT) / 100.0, 2) AS totacctbal
    FROM idle i, pos p
    WHERE i.bal_cents * p.n_pos > p.total_cents
    GROUP BY i.cntry
    """,
    doc="TPC-H Q22 (full shape): customers in selected country groups "
    "with above-average balances and no RECENT orders (none since "
    "2001 — this corpus has no fully order-less customers, so the "
    "Q22 'dormant for 7 years' test keeps its anti-join shape on a "
    "date-filtered build side) — scalar-average subquery + anti join "
    "+ group report. This schema has no c_phone, so the country code "
    "is c_nationkey % 5. The above-average test "
    "runs in EXACT integer cents, cross-multiplied "
    "(bal·n > Σbal) instead of compared against a floating avg — a "
    "float average's last ulp depends on summation order and could "
    "flip boundary customers between engines; integers cannot. "
    "Scale: the avg reduces to 2 numbers (broadcast); the anti join "
    "shuffles on custkey; the report is ≤ 5 groups.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 5).alias("cntry"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    ).filter(F.col("cntry").isin(0, 1, 2))
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("total_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    idle = cust.join(o, cust.c_custkey == o.o_custkey, "anti")
    return (
        idle.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("total_cents"))
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
    )


# ------------------------------------------- event-sequence analytics

@query(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS name, (SELECT count(*) FROM v) AS users
    UNION ALL
    SELECT 2, 'view>click', (SELECT count(*) FROM c)
    UNION ALL
    SELECT 3, 'view>click>purchase', (SELECT count(*) FROM p)
    """,
    doc="Event-sequence funnel: users who viewed, then clicked AFTER "
    "their first view, then purchased after that click — the ORDERED "
    "conversion funnel (min-timestamp chaining, not mere event-type "
    "membership). All comparisons in integer epoch-µs (the ts-domain "
    "rule). Scale: three same-key groupBys + joins — every stage "
    "co-partitions on user_id, so AQE reuses one exchange lineage; "
    "stage frames shrink monotonically.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t1")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    def stage(n, name, df):
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(n).alias("stage"), F.lit(name).alias("name"), "users"
        )
    return (
        stage(1, "view", v)
        .unionByName(stage(2, "view>click", c))
        .unionByName(stage(3, "view>click>purchase", p))
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(epoch_us(ts)) // 604800000000 AS cohort_wk
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT e.user_id, epoch_us(e.ts) // 604800000000 AS wk
      FROM events e
    )
    SELECT f.cohort_wk, a.wk - f.cohort_wk AS weeks_since,
           count(*) AS n_users
    FROM active a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY f.cohort_wk, a.wk - f.cohort_wk
    """,
    doc="Retention cohort matrix: users bucketed by first-activity "
    "week, counted in each subsequent active week — the standard "
    "cohort-retention report. Weeks are integer epoch-µs divisions "
    "(no date_trunc — engine week conventions differ; integer "
    "arithmetic cannot). Scale: two user_id-partitioned aggregations "
    "+ one co-partitioned join; the matrix is (weeks × weeks) tiny.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = F.expr("us div 604800000000")
    e = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    firsts = e.groupBy("user_id").agg(
        F.expr("min(us) div 604800000000").alias("cohort_wk")
    )
    active = e.select("user_id", wk.alias("wk")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_sessionize",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_us(ts), event_id)
                       > 1800000000
                    OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY epoch_us(ts), event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, us,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
      FROM seq
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           max(us) - min(us) AS duration_us
    FROM sess GROUP BY user_id, session_idx
    """,
    doc="Batch sessionization (gaps-and-islands): a new session starts "
    "after a >30-min silence; running-sum window assigns session ids, "
    "then per-session stats — the batch twin of the streaming "
    "session-window entry (B14), all in integer epoch-µs. Tie-break "
    "on event_id makes the lag deterministic under equal timestamps. "
    "Scale: ONE user_id exchange serves both window functions and the "
    "final aggregation (same partitioning).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    seq = e.select(
        "user_id",
        "event_id",
        "us",
        F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = seq.select(
        "user_id", "us", F.sum("is_new").over(w2).alias("session_idx")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "double-correlated EXISTS / NOT-EXISTS — a supplier's late "
    "lineitem counts iff the 'F' order had ANOTHER supplier and NO "
    "other supplier was late. This schema has no "
    "l_receiptdate/l_commitdate, so 'late' is the documented "
    "adaptation l_shipdate > o_orderdate + 60 days (same per-order "
    "threshold for every correlated branch — the plan shape is "
    "untouched). Scale: semi + anti joins on the 8-byte orderkey "
    "(the o_orderdate threshold rides the probe row, so the anti "
    "build side is the bare lineitem projection); supplier×nation "
    "broadcasts; final report is a TakeOrdered over ≤ |supplier| "
    "rows.",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    base = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    with_other = base.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    l3 = l.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    sole_late = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    sn = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "semi"
    ).select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
