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

One measured limitation of ``persist_disk`` in ITERATIVE callers:
persist truncates *execution* (cached blocks are reused) but NOT the
*logical plan* — round N's analyzed tree still contains rounds 1..N-1,
and a fixpoint whose step references its state twice doubles the tree
per round. A 39-round min-label run OOMed the driver on plan-string
generation alone. Deep O(diameter) fixpoints should therefore run
under ``local_checkpoint`` or ``reliable`` (both replace the plan with
a scan of the materialized result); ``persist_disk`` is safe for the
O(log² n)-round star variant and for non-iterative fan-outs.
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


def materialize_fixpoint(df: DataFrame, strategy: str | None = None) -> DataFrame:
    """``materialize_once`` for PER-ROUND FIXPOINT STATE (the CC loops).

    Iterative state has a requirement one-shot fan-outs don't: the
    logical plan must be TRUNCATED each round, because a step that
    references its state twice doubles the analyzed tree per round —
    measured here as a driver OOM on plan-string generation alone
    (module docstring). ``persist`` caches execution but keeps the
    plan, so ``persist_disk`` cannot serve fixpoints no matter how
    diligently superseded generations are unpersisted. This is the
    same reason GraphX/GraphFrames periodically *checkpoint* iterative
    state rather than persist it.

    Mapping: ``persist_disk`` upgrades to the cluster-safe truncating
    strategy — ``reliable`` checkpoint when a checkpoint dir is
    configured (the production setting), else ``localCheckpoint`` (the
    single-JVM fallback; executor loss would fail the job there, which
    on a real cluster is exactly why you configure the dir).
    ``local_checkpoint`` / ``reliable`` / ``none`` pass through
    (``none`` stays available for A/B on few-round graphs; a deep
    fixpoint under ``none`` hits the same plan growth, documented).
    """
    strategy = strategy or os.environ.get(ENV_VAR, "local_checkpoint")
    if strategy == "persist_disk":
        sc = df.sparkSession.sparkContext
        if not sc._jsc.sc().getCheckpointDir().isEmpty():
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)
    return materialize_once(df, strategy)


def release(df: DataFrame) -> None:
    """Free a materialized frame's storage once NOTHING will consume it
    again — the other half of the strategy-knob contract.

    Two backing stores, two paths:

    - ``persist_disk`` frames: blocks are pinned by the cache manager
      until session end, so an iterative caller (the CC fixpoint
      loops, the streaming dedup sink's per-batch survivors) that
      never unpersists accumulates one generation of DISK_ONLY blocks
      per round — linear disk growth with iteration count on a real
      cluster. ``unpersist`` frees them; on a never-persisted frame
      (the ``none`` mode) it is a harmless no-op.
    - checkpoint-backed frames (``local_checkpoint`` / ``reliable``):
      the plan is a LogicalRDD over the checkpointed RDD — unpersist
      that RDD directly. The ContextCleaner would eventually reclaim
      these on driver GC, but "eventually" is unbounded inside a long
      fixpoint or a 100-batch streaming run, so superseded generations
      are freed deterministically here instead.

    DANGER, stated plainly: a locally-checkpointed frame has NO
    lineage — after release it cannot be read again. Only call this on
    frames whose last consumer has run (the superseded generation in a
    loop; a sink's frame after its final write).
    """
    try:
        df.unpersist(blocking=False)
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass  # freeing storage must never fail the computation
