"""Executor-storage hygiene helpers for checkpointed DataFrames.

``DataFrame.unpersist()`` only drops CacheManager entries (frames the
caller ``persist()``-ed). A ``localCheckpoint(eager=True)`` frame holds
its rows as RDD storage blocks owned by the ``LogicalRDD`` at the root
of the checkpointed plan; those blocks are NOT cache-manager entries,
so ``unpersist()`` is a no-op for them and they otherwise live until
the ContextCleaner notices the RDD became garbage — unbounded latency
under driver memory pressure. Reaching through the analyzed plan to
the underlying RDD releases the blocks immediately (verified against
``SparkContext.getRDDStorageInfo`` — see tests/test_r13_storage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_materialized(df: DataFrame) -> bool:
    """True iff ``df`` is a localCheckpoint-ed frame whose RDD has
    actually MATERIALIZED (a job ran over it and the lineage was
    truncated). A lazy (eager=False) checkpoint that no action has
    touched yet returns False — releasing its PREDECESSOR then would
    destroy the only copy of the data its first materialization still
    needs. Best effort: unknown shapes report False (never released
    early)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return bool(plan.rdd().isCheckpointed())
    except Exception:  # noqa: BLE001 — best effort only
        pass
    return False


def release_checkpoint(df: DataFrame) -> None:
    """Free a superseded DataFrame's storage NOW, best effort.

    Handles both kinds of retained storage:

    * a ``localCheckpoint``-ed frame (plan root is a ``LogicalRDD``):
      unpersist the underlying RDD's blocks directly;
    * a ``persist()``-ed frame: plain ``unpersist()`` drops the
      CacheManager entry.

    Callers must guarantee nothing will read the frame again — every
    downstream consumer either finished or reads a NEWER materialized
    frame. Any JVM-shape mismatch degrades to ``unpersist()`` (the old
    ContextCleaner-eventual behavior), never an error.
    """
    released = False
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            released = True
    except Exception:  # noqa: BLE001 — best effort only
        pass
    if not released:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — best effort only
            pass
