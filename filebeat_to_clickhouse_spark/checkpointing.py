"""Lineage-cut strategy for iterative operators (connected components,
k-means, multi-consumer intermediates).

Iterative DataFrame plans double in depth each round, and the optimizer
re-derives every prior round per action unless lineage is cut. Two ways to
cut it, with very different failure semantics:

- ``localCheckpoint`` stores blocks on EXECUTORS: fast (no distributed
  filesystem round-trip) but an executor loss destroys blocks with no
  lineage left to recompute them — the job dies. Right for local[] runs
  and short interactive jobs.
- reliable ``checkpoint()`` writes to the SparkContext checkpoint
  directory (HDFS/S3): each round's state survives any executor loss —
  the only safe setting for multi-hour 100 TB jobs on preemptible or
  merely fallible hardware.

``make_lineage_cut(checkpoint_dir)`` returns a ``cut(df, eager=...)``
function implementing whichever strategy the caller selected, so every
iterative operator takes ``checkpoint_dir: str | None = None`` and the
durability decision is a call-site PARAMETER, not a code edit (the round-2
verdict's top item).

Checkpoint files accumulate one directory per cut; long-running clusters
should set ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` or
clean the directory between jobs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

LineageCut = Callable[..., DataFrame]


def default_checkpoint_dir() -> str | None:
    """The deployment-level default: ``SPARK_GRAFT_CHECKPOINT_DIR`` if set,
    else None (localCheckpoint). The registered query surface has a fixed
    (spark, sf_dir) signature, so cluster deployments opt into reliable
    checkpointing through this env var rather than a call-site edit."""
    return os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None


def make_lineage_cut(checkpoint_dir: str | None) -> LineageCut:
    """Return ``cut(df, eager=True)``: localCheckpoint when
    ``checkpoint_dir`` is None, reliable checkpoint into ``checkpoint_dir``
    otherwise. The checkpoint dir is applied to the SparkContext on first
    use (setCheckpointDir is per-context; checkpoint() itself places each
    cut in a fresh subdirectory, so repeated cuts never collide)."""
    if checkpoint_dir is None:

        def cut_local(df: DataFrame, eager: bool = True) -> DataFrame:
            return df.localCheckpoint(eager=eager)

        return cut_local

    state = {"configured": False}

    def cut_reliable(df: DataFrame, eager: bool = True) -> DataFrame:
        sc = df.sparkSession.sparkContext
        if not state["configured"]:
            sc.setCheckpointDir(checkpoint_dir)
            state["configured"] = True
        return df.checkpoint(eager=eager)

    return cut_reliable
