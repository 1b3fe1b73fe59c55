"""CDC snapshot materialization — table state at a point in time.

The reference emits insert / update_before / update_after / delete
events in GTID order ((domain, server_id, sequence, event_number),
/root/reference/types.go:172-179); folding them by primary key yields
the live table. This module is that fold, declaratively.

Scale: one hash-shuffle on the primary key; the per-key "latest wins"
is a window ``row_number`` (or ``max_by``), which AQE skew-splits on hot
keys. At 100 TB of change events this is the standard
compact-the-changelog plan; no state is held on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: MaxScale CDC DML event types (/root/reference/types.go:178; FIXTURES.md B2).
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = (
    "insert",
    "update_before",
    "update_after",
    "delete",
)


def materialize_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_type_col: str = "event_type",
    as_of: Column | None = None,
) -> DataFrame:
    """Fold a change stream into current table state.

    - ``update_before`` images are discarded (they carry the *old* row).
    - the latest remaining event per key wins (ordered by ``order_cols``,
      e.g. the GTID tuple or ``(ts_ns, event_number)``).
    - keys whose latest event is a ``delete`` are dropped.
    - ``as_of``: optional boolean column to time-travel (filter first).
    """
    df = changes
    if as_of is not None:
        df = df.filter(as_of)
    df = df.filter(F.col(event_type_col) != UPDATE_BEFORE)
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(event_type_col) != DELETE)
        .drop("__rn")
    )


def materialize_snapshot_salted(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_type_col: str = "event_type",
    as_of: Column | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """``materialize_snapshot`` as a salted two-phase max_by aggregate —
    the straggler-proof form for pathologically hot keys.

    The window form partitions BY KEY: a key holding 30% of a 100 TB
    changelog serializes on one reducer (SCALING.md r4 named per-key
    windows as the one unsplittable stage under single-key skew). Here
    the fold is an aggregation instead: phase 1 groups by (key, salt)
    — salt = hash of the order tuple, so a hot key's rows spread over
    ``n_salts`` reducers — keeping each group's winning row via
    ``max_by(row, order)``; phase 2 reduces the ≤ n_salts partial
    winners per key. "Latest wins" is associative, so the result is
    row-identical to the window form (equality pytested under the 30%
    single-key replica transform; ties impossible — the order tuple
    ends in the unique event id).

    Scale notes: max_by already map-side-combines (each scan partition
    ships one row per key it sees), which alone removes most of the
    skew; the explicit salt stage is still the right template because
    it (a) caps the phase-1 reducer state for a key at
    rows-per-partition regardless of combiner effectiveness and
    (b) generalizes to folds WITHOUT a partial-aggregate form (e.g.
    collect_list-based session reconstruction). No Window node appears
    anywhere in the plan (plan-asserted).
    """
    df = changes
    if as_of is not None:
        df = df.filter(as_of)
    df = df.filter(F.col(event_type_col) != UPDATE_BEFORE)
    out_cols = df.columns
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    row_struct = F.struct(*[F.col(c) for c in out_cols])
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        F.max_by(row_struct, ord_struct).alias("__win"),
        F.max(ord_struct).alias("__ord"),
    )
    phase2 = phase1.groupBy(*key_cols).agg(F.max_by("__win", "__ord").alias("__win"))
    return (
        phase2.select("__win.*")
        .filter(F.col(event_type_col) != DELETE)
        .select(*out_cols)
    )


def materialize_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_type_col: str = "event_type",
) -> DataFrame:
    """SCD2 / type-2 history: the OTHER standard CDC fold. Where
    ``materialize_snapshot`` keeps only each key's latest row, this
    keeps EVERY accepted change image with its validity interval —
    the slowly-changing-dimension table a warehouse derives from the
    reference's change stream (insert / update_after open a version,
    the next change closes it, delete closes without opening).

    Output = the non-tombstone change rows plus:
      - ``valid_from`` — the row's first order column value;
      - ``valid_to``   — the NEXT event's (any type, including the
        closing delete) first order column value, NULL while open;
      - ``is_current`` — valid_to IS NULL.

    Semantics notes: ``update_before`` images are discarded as in the
    snapshot fold (they duplicate the prior version's payload);
    a re-insert after a delete opens a fresh interval — the gap
    between the delete's timestamp and the re-insert is correctly
    uncovered. The fold is deterministic for a total ``order_cols``
    (end the tuple in the unique event id, types.go:172-179 GTID
    discipline).

    Scale: one hash shuffle on the key + a per-key ``lead`` window.
    The lead is inherently sequential per key (each version needs its
    successor), so a pathologically hot key serializes its partition —
    same class as the window snapshot form; range-partition the
    changelog by (key, time) first if one key dominates (the salted
    max_by trick does not apply: intervals are not associative).
    """
    df = changes.filter(F.col(event_type_col) != UPDATE_BEFORE)
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    valid_from = F.col(order_cols[0])
    df = df.withColumn("__valid_to", F.lead(valid_from).over(w))
    return (
        df.filter(F.col(event_type_col) != DELETE)
        .withColumn("valid_from", valid_from)
        .withColumnRenamed("__valid_to", "valid_to")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def route_by_event_type(changes: DataFrame, event_type_col: str = "event_type") -> dict[str, DataFrame]:
    """Event-type routing (reference dispatch, stream.go:119-141): one
    filtered DataFrame per change kind. Filters are pushed to the scan,
    so each route reads only its slice under predicate pushdown."""
    return {
        t: changes.filter(F.col(event_type_col) == t)
        for t in (INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE)
    }
