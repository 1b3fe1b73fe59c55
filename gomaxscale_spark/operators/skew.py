"""Skew-mitigation utilities: salted joins and hot-key isolation.

AQE's skew-join splitting (enabled in session.RUNTIME_CONFS) handles
moderate skew automatically at shuffle time. Salting is the explicit
tool for the pathological case — one key holding a double-digit share
of a 100 TB fact table — and for aggregations, where AQE does not help
the reduce side.

`salted_join`: fact rows get a uniform salt in [0, n); the dim side is
exploded ×n so every (key, salt) pair exists → the hot key's rows
spread across n reducers. Cost: dim side inflates ×n — use only when
the build side is small or the salt is applied selectively to known-hot
keys (`hot_keys` argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, spreading hot fact keys over
    `n_salts` reducers.

    With `hot_keys`, only those keys are salted (dim inflation limited
    to the hot subset); otherwise every key is salted.

    Determinism: the salt is a hash of the full fact row's key plus a
    monotonic id — uniform, but the join RESULT is identical to the
    unsalted join (asserted in tests).
    """
    if hot_keys is not None:
        hot = F.col(on).isin(*hot_keys)
        salt_fact = F.when(hot, F.pmod(F.xxhash64(F.col(on), F.rand(seed=42) * 1e9), F.lit(n_salts))).otherwise(
            F.lit(0)
        )
    else:
        salt_fact = F.pmod(F.xxhash64(F.col(on), (F.rand(seed=42) * 1e9).cast("long")), F.lit(n_salts))

    fact_s = fact.withColumn("__salt", salt_fact.cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    if hot_keys is not None:
        dim_s = dim.withColumn(
            "__salt_arr",
            F.when(
                F.col(on).isin(*hot_keys), F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        ).select(*dim.columns, F.explode("__salt_arr").alias("__salt"))
    else:
        dim_s = dim.select(*dim.columns, salts)
    return fact_s.join(dim_s, [on, "__salt"], how).drop("__salt")


def key_histogram(df: DataFrame, on: str, top: int = 20) -> DataFrame:
    """Skew diagnosis: per-key row counts, heaviest first — run this
    before deciding between AQE, salting, or hot-key isolation."""
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc(on))
        .limit(top)
    )
