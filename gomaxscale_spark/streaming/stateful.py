"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2 B14): a per-key running aggregator over a change stream.

This is the general escape hatch when built-in windows can't express
the state machine — the Spark analogue of the reference's user callback
holding its own state across events (Process(), gomaxscale.go:173-191),
with the state made explicit, partitioned, and fault-tolerant.

`running_totals` keeps (count, sum, last_value, last_order) per key and
emits one updated row per key per micro-batch — a live materialized
aggregate of the CDC stream.

Scale: state lives in the state store partitioned by the grouping key —
the same shuffle as a groupBy. Emit-per-batch output is proportional to
*touched* keys, not total keys. Use GroupStateTimeout to GC idle keys
when the key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total double, last_value double"
STATE_SCHEMA = "n bigint, total double, last_value double, last_order bigint"


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_value, last_order = state.get
    else:
        n, total, last_value, last_order = 0, 0.0, 0.0, -1
    for pdf in pdfs:
        pdf = pdf.sort_values("order_col")
        n += len(pdf)
        total += float(pdf["value"].sum())
        tail = pdf.iloc[-1]
        if int(tail["order_col"]) >= last_order:
            last_order = int(tail["order_col"])
            last_value = float(tail["value"])
    state.update((n, total, last_value, last_order))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total": [round(total, 2)],
            "last_value": [last_value],
        }
    )


def running_totals(events: DataFrame, key_col: str = "user_id", order_col: str = "event_id") -> DataFrame:
    """Per-key running (count, sum, last) over a stream of events.

    Works on a streaming DataFrame with columns (key_col, value,
    order_col). Batch equivalence: groupBy(key).agg(count, sum,
    max_by(value, order)) — asserted in tests.
    """
    prepared = events.selectExpr(
        f"{key_col} AS user_id", "value", f"{order_col} AS order_col"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
