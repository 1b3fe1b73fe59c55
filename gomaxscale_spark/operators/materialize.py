"""Materialization strategy for intermediates that feed multiple plan
arms (LSH candidate sets, dedup'd corpora, fixpoint states).

Why materialize at all: Spark re-executes a DataFrame's lineage for
every plan arm that consumes it. `ReusedExchange` only kicks in when
two arms share an *identical* exchange subtree inside ONE action —
across separate joins/aggregations of the same expensive intermediate
it usually does not apply (measured on the capstone: the no-
materialization form re-runs the quality-scan + dedup shuffle per
arm). So operators whose output fans out materialize it exactly once.

Why a strategy knob: `localCheckpoint` (the local[N] default) is the
fastest way to truncate lineage, but it stores blocks in *executor-
local, non-replicated* storage — on a real cluster one lost executor
makes those blocks unrecoverable and fails the job. The cluster-safe
equivalent is `persist(StorageLevel.DISK_ONLY)`: blocks spill to local
disk but the lineage is KEPT, so a lost executor's partitions are
recomputed instead of lost. (A reliable `checkpoint()` to HDFS/object
storage is the third option for lineages too expensive to ever replay;
it needs `spark.sparkContext.setCheckpointDir` and is out of scope for
the sandbox.)

Pick with the ``SPARK_GRAFT_MATERIALIZE`` env var or per call:

- ``local_checkpoint`` (default) — fastest on local[N]; single-JVM
  "cluster" cannot lose an executor, so the non-replication caveat is
  moot in the bench/gate environment.
- ``persist_disk`` — 100 TB cluster setting: recomputable lineage,
  disk-backed blocks, an eager count() job populates the cache before
  any consumer arm runs (without eagerness, two arms scheduled in the
  same job may each compute partitions before the cache fills).
- ``reliable`` — eager ``checkpoint()`` to the directory configured
  via ``spark.sparkContext.setCheckpointDir`` (HDFS/object storage on
  a cluster): blocks survive executor AND node loss, lineage is
  truncated. The setting for intermediates whose lineage is too
  expensive to ever replay (a multi-hour candidate-generation stage
  feeding a week of downstream jobs). Raises if no checkpoint dir is
  configured — that is a deploy mistake, not something to paper over.
- ``none`` — no materialization; every consumer arm replays lineage.
  Only for A/B measurement.

Both non-none modes are result-equivalent (asserted by
tests/test_operators.py::test_materialize_modes_agree); the knob trades
recovery semantics for speed, never results.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

ENV_VAR = "SPARK_GRAFT_MATERIALIZE"

_VALID = ("local_checkpoint", "persist_disk", "reliable", "none")


def materialize_once(df: DataFrame, strategy: str | None = None) -> DataFrame:
    """Compute ``df`` once and return a frame all consumer arms share.

    ``strategy`` overrides the ``SPARK_GRAFT_MATERIALIZE`` env var
    (default ``local_checkpoint`` — see module docstring for the
    cluster-safety trade-off per mode).
    """
    strategy = strategy or os.environ.get(ENV_VAR, "local_checkpoint")
    if strategy not in _VALID:
        raise ValueError(f"unknown materialize strategy {strategy!r}; pick one of {_VALID}")
    if strategy == "none":
        return df
    if strategy == "persist_disk":
        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()
        return out
    if strategy == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            raise RuntimeError(
                "SPARK_GRAFT_MATERIALIZE=reliable needs "
                "spark.sparkContext.setCheckpointDir(<fault-tolerant path>)"
            )
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
