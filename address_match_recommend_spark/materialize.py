"""Stage materialization policy — local vs reliable checkpoint.

Every expensive pipeline stage is materialized with lineage truncation
(the round-3 serial-fraction fix: ``persist()`` caches data but every
downstream action still re-plans the full accumulated DAG driver-side —
measured 9.4 s vs 0.11 s on a cached 78k-row frame). Two mechanisms:

- ``localCheckpoint`` (default): blocks live in executor storage with
  replication 1 and NO lineage — fastest, but an executor loss makes the
  job unrecoverable (ADVICE r3: there are no replicas to recompute from).
  Right for single-JVM local runs and benchmarks.
- ``Dataset.checkpoint`` (``cfg.reliable_checkpoint=True``): blocks are
  written to the SparkContext checkpoint directory (HDFS/S3 on a real
  cluster), so executor decommission — spot reclamation, OOM kill — is
  survivable. Slower per stage (a write + read of the stage output);
  use for long multi-executor jobs. The directory is taken from an
  already-set ``sparkContext.setCheckpointDir`` or, failing that, from
  ``cfg.checkpoint_dir + '/_rdd'``.

Orthogonal to ``sources.checkpoint.Checkpointer`` (durable parquet with
resume + lineage/metrics ledgers): the Checkpointer makes a KILLED job
resumable across processes; ``reliable_checkpoint`` makes a RUNNING job
survive executor loss without restarting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, cfg=None, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage (see module docstring
    for the local-vs-reliable policy)."""
    if cfg is not None and getattr(cfg, "reliable_checkpoint", False):
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            if not cfg.checkpoint_dir:
                raise ValueError(
                    "reliable_checkpoint=True needs sparkContext."
                    "setCheckpointDir(...) or cfg.checkpoint_dir"
                )
            sc.setCheckpointDir(cfg.checkpoint_dir.rstrip("/") + "/_rdd")
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
