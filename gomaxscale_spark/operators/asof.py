"""As-of (point-in-time) join — "latest right-side row at or before t".

The reference delivers a time-ordered change stream per table
(DMLEvent.Timestamp, /root/reference/types.go:177, with the GTID tuple
(domain, server_id, sequence, event_number) as the total order,
types.go:173-176). Answering "what was the row state when X happened"
over that stream is exactly an as-of join.

Implementation: the **union-sort trick**, fully declarative — no Python
in the hot path, no O(L×R) expansion:

1. tag right rows (the quotes/events) and left rows (the probes),
2. union them on (key, time, tag),
3. one window sorted by (time, tag) per key carries the most recent
   right-side payload forward with ``last(ignorenulls=True)``,
4. keep only left rows.

Scale: a single hash-shuffle on the join key (both inputs), then a
sort within partitions — the same cost profile as a sort-merge join,
with no risk of a fan-out product on hot keys. Skewed keys are handled
by AQE skew-split since the window partitions by key only. At 100 TB
this is the textbook plan; the alternative (equi-join + filter +
re-aggregate) shuffles L×R_matches rows and loses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_time] <= left[left_time]`` and equal join key.

    Parameters
    ----------
    on : join key column name (same name both sides).
    left_time / right_time : ordering columns (must be mutually
        comparable; use exact integer times, e.g. ``ts_ns``, to avoid
        float/precision boundary surprises).
    payload : mapping ``right_col -> output_col`` of right columns to
        carry onto left rows.
    how : 'inner' drops left rows with no prior right row; 'left' keeps
        them with NULL payload.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        # tag 0 sorts before tag 1 at equal time → right row at exactly
        # t is visible to a left row at t (<= semantics, matching the
        # reference's "state as of the event" reading of the stream).
        F.lit(0).alias("__tag"),
        *[F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[
            F.lit(None).cast(right.schema[src].dataType).alias(f"__p_{dst}")
            for src, dst in payload.items()
        ],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).select(
        # one select → one Window node (a withColumn loop planned N
        # windows over the same spec)
        "__k",
        "__t",
        "__tag",
        *[F.col(f"__l_{name}") for name in lcols],
        *[
            F.last(f"__p_{dst}", ignorenulls=True).over(w).alias(f"__p_{dst}")
            for dst in payload.values()
        ],
    )
    out = merged.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__p_{dst}").alias(dst) for dst in payload.values()],
    )
    if how == "inner":
        first_payload = next(iter(payload.values()))
        out = out.filter(F.col(first_payload).isNotNull())
    return out


def range_join(left: DataFrame, right: DataFrame, condition: Column, how: str = "inner") -> DataFrame:
    """Theta/range join: arbitrary boolean condition.

    Scale: Catalyst executes a non-equi join as BroadcastNestedLoopJoin
    when one side is small (broadcast the dim side explicitly!) else a
    cartesian — so callers must keep one side bounded (pre-filter /
    pre-aggregate). For banded range predicates prefer bucketizing the
    range key and equi-joining on the bucket (see plans catalog
    ``range_join_bucketed``) — that turns the O(L×R) loop into a
    shuffle-hash join at 100 TB.
    """
    return left.join(right, condition, how)
