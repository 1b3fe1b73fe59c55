"""The sanctioned Python escape hatches, mirroring the reference's
user-callback surface (`Process(func)`, /root/reference/gomaxscale.go:173-191)
in Spark's three UDF shapes:

- scalar `pandas_udf`        — vectorized per-value transform,
- `applyInPandas`            — per-group computation (UDAF-ish),
- `mapInPandas`              — per-partition batch iterator (UDTF-ish).

All three are Arrow-batched: the per-event fault isolation the reference
does with `recover()` (gomaxscale.go:175-179) maps to per-batch
try/except + Spark task retry.

Scale: pandas_udf/mapInPandas are map-only (no shuffle); applyInPandas
shuffles once on the grouping key and each group must fit in executor
memory — callers must group by high-cardinality keys (user_id: millions
of small groups — good; event_type: 5 giant groups — bad).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def log1p_value(col):
    """Vectorized log(1+x) — numpy over an Arrow batch.

    Built lazily (pandas_udf registration needs an active session).
    """

    @pandas_udf("double")
    def _log1p(v: pd.Series) -> pd.Series:
        return np.log1p(v)

    return _log1p(col)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """applyInPandas: z-score of `value_col` within each group (ddof=1,
    matching SQL stddev_samp). Groups with <2 rows are dropped (stddev
    undefined)."""

    out_schema = f"{group_col} bigint, event_id bigint, zscore double"

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["g", "event_id", "zscore"]).astype(
                {"g": "int64", "event_id": "int64", "zscore": "float64"}
            ).rename(columns={"g": group_col})
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "event_id": pdf["event_id"],
                "zscore": ((pdf[value_col] - mean) / std).round(6),
            }
        )

    return df.groupBy(group_col).applyInPandas(zscore, schema=out_schema)


def doc_stats_mapinpandas(documents: DataFrame) -> DataFrame:
    """mapInPandas: per-row text stats computed batch-wise (the UDTF-ish
    shape: input batch → output batch with a new schema)."""

    schema = "doc_id bigint, n_tokens int, n_upper int, recomputed_chars int"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split().map(len).astype("int32"),
                    "n_upper": pdf["text"].str.count(r"[A-Z]").astype("int32"),
                    "recomputed_chars": pdf["text"].str.len().astype("int32"),
                }
            )

    return documents.mapInPandas(stats, schema=schema)


def mean_abs_deviation(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series → scalar): per-group mean
    absolute deviation — the UDAF shape. One shuffle on the group key;
    Arrow moves each group's values once."""

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        return float((v - v.mean()).abs().mean())

    return df.groupBy(group_col).agg(F.round(mad(F.col(value_col)), 4).alias("mad"))


def register_json_kv_udtf(spark) -> None:
    """Python UDTF (Spark 3.5+ table function): expand a JSON object
    column into (key, value) rows — the RawData pattern (types.go:181-190)
    when the payload's keys are not known at plan time, so a fixed
    from_json schema can't express it.

    UDTFs are the fourth Python surface next to scalar pandas_udf /
    applyInPandas / mapInPandas: one input row → N output rows, usable
    in SQL FROM with LATERAL correlation. Built lazily (needs an active
    session; module-level decorators don't have one).
    """
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value bigint")
    class JsonKV:
        def eval(self, props: str):
            if props:
                for k, v in _json.loads(props).items():
                    yield k, int(v)

    spark.udtf.register("json_kv", JsonKV)
