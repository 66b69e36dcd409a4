"""Streaming entity resolution — incremental_update driven by foreachBatch.

The reference's write path is a synchronous per-record insert
(``ImportAddr``, /root/reference/core/similarity.go:551-581): a new
address joins the index and is immediately findable, without re-scoring
the stored corpus. This module is that path as a CONTINUOUS job: a
transcript-turn stream feeds ``plans.incremental.incremental_update``
one micro-batch at a time through ``foreachBatch`` — the standard Spark
pattern for per-batch logic that needs more than windowed aggregation
(multi-stage joins against persisted state).

State layout (``state_dir``)
----------------------------
Versioned, append-only; one version per applied micro-batch or refit::

    state_dir/
      v00000000/            bootstrap (full pipeline run)
        conversations/ representatives/ postings/ idf/ clusters/
        _BASE  _COMMIT
      v00000001/            micro-batch 0
        conversations/ representatives/ postings/   (batch DELTAS)
        clusters/                                   (full rewrite)
        _BATCH_0  _COMMIT
      v00000002/            refit (full pipeline re-run, fresh IDF)
        conversations/ representatives/ postings/ idf/ clusters/
        _BASE  _COMMIT    — supersedes everything before it

- ``conversations`` / ``representatives`` / ``postings`` are per-batch
  DELTAS — reading state unions the committed versions, so a micro-batch
  writes O(batch), never O(corpus). (Production note: on an Iceberg/Delta
  table this union is a plain append; the version dirs are the
  plain-parquet equivalent that needs no table format in the sandbox.)
- ``clusters`` is rewritten per version: cluster merges triggered by a
  bridging batch can relabel ARBITRARY old rows, so the clusters frame is
  the one state table that is not append-only. It is one compact row per
  conversation; at Iceberg scale this becomes MERGE INTO on the changed
  entity_ids only.
- ``idf`` is written at bootstrap/refit and held fixed between bases —
  identical semantics to the reference, which scores new records against
  the stored corpus's statistics (/root/reference/core/similarity.go:
  342-364); unseen tokens take ``cfg.missing_idf``. ``refit()`` re-fits
  the dictionary on a cadence (the documented policy in
  plans/incremental.py).

Exactly-once
------------
``foreachBatch`` re-runs a batch_id after a failure. Each applied batch
writes a ``_BATCH_{batch_id}`` marker into its version dir, and the
version is committed atomically LAST (an empty ``_COMMIT`` file after
every table write): a replayed batch whose id appears in any committed
version is skipped, an uncommitted partial version is ignored by
readers and overwritten. Version numbers are decoupled from batch ids
because ``refit()`` also consumes a version slot. Combined with the streaming
checkpoint's file-source tracking this gives exactly-once state updates.

The state-directory plumbing here uses the DRIVER's local filesystem
API (``os.listdir`` / atomic file create), so ``state_dir`` must be a
path the driver can see — local disk or a shared mount. On a real
cluster, swap the version-directory layout for an Iceberg/Delta table:
versions become table snapshots, the delta union-read becomes a plain
append, and the ``_COMMIT`` marker becomes the table format's atomic
snapshot commit — the semantics map 1:1.

Batch-split invariance: the FINAL clustering does not depend on how the
arriving conversations are partitioned into micro-batches (one batch vs
many), because (a) the IDF is frozen at bootstrap and old-side vectors
are recomputed from it per batch, and (b) tokens outside the bootstrap
vocabulary are indexed immediately at ANY batch df (see the unseen-df
clamp in plans/incremental.py — without it, a new entity's signature
token arriving one conversation per batch would never block). Exact
when the per-conversation blocking-token budget is not binding (the
budget orders by df, which is batch-local for unseen tokens); pinned by
``tests/test_streaming.py::test_streaming_er_split_invariance``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..plans.incremental import incremental_update
from ..plans.pipeline import run_pipeline

_DELTA_TABLES = ("conversations", "representatives", "postings")


class StreamingER:
    """Continuous incremental entity resolution over a transcript stream.

    Usage::

        er = StreamingER(spark, state_dir)
        er.bootstrap(initial_transcripts)          # full pipeline once
        q = er.attach(stream_transcripts(spark, in_path), ckpt_path)
        q.awaitTermination()
        er.read_clusters()                         # latest clustering
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: PipelineConfig | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.cfg = cfg or PipelineConfig()

    # -- state plumbing ---------------------------------------------------

    def _vdir(self, version: int) -> str:
        return f"{self.state_dir}/v{version:08d}"

    def _committed_versions(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("v") and os.path.exists(
                os.path.join(self.state_dir, name, "_COMMIT")
            ):
                out.append(int(name[1:]))
        return sorted(out)

    def _commit(self, version: int) -> None:
        open(os.path.join(self._vdir(version), "_COMMIT"), "w").close()

    def _base_of(self, versions: list[int]) -> int:
        """Latest committed BASE version (bootstrap or refit): the one
        whose tables are FULL rewrites; deltas after it are unioned on
        top, anything before it is superseded."""
        bases = [
            v
            for v in versions
            if os.path.exists(os.path.join(self._vdir(v), "_BASE"))
        ]
        if not bases:
            raise ValueError(f"no committed base version under {self.state_dir}")
        return bases[-1]

    def _applied_batch_ids(self) -> set[int]:
        """batch_ids already folded in (replay guard) — version numbers
        are decoupled from batch ids because refit() also consumes a
        version slot."""
        out: set[int] = set()
        for v in self._committed_versions():
            for name in os.listdir(self._vdir(v)):
                if name.startswith("_BATCH_"):
                    out.add(int(name[len("_BATCH_"):]))
        return out

    def _read_union(self, table: str, versions: list[int]) -> DataFrame:
        paths = [
            p
            for p in (f"{self._vdir(v)}/{table}" for v in versions)
            if os.path.isdir(p)
        ]
        return self.spark.read.parquet(*paths)

    def read_clusters(self) -> DataFrame:
        """Latest committed clustering (one row per conversation)."""
        versions = self._committed_versions()
        have = [
            v for v in versions if os.path.isdir(f"{self._vdir(v)}/clusters")
        ]
        if not have:
            raise FileNotFoundError(f"no committed clusters under {self.state_dir}")
        return self.spark.read.parquet(f"{self._vdir(have[-1])}/clusters")

    def vacuum(self) -> list[int]:
        """Delete committed versions strictly before the latest base —
        the base's full rewrite supersedes their tables, so only disk and
        the union-read's path list are reclaimed; no reader result
        changes. Replay protection survives: each removed version's
        ``_BATCH_*`` markers are re-homed into the base dir BEFORE the
        version is deleted (a marker file is idempotent, and the base is
        already committed), so a very late replay of an old batch_id is
        still skipped. Returns the removed version numbers."""
        import shutil

        committed = self._committed_versions()
        if not committed:
            return []
        base = self._base_of(committed)
        removed = []
        for v in committed:
            if v >= base:
                continue
            vdir = self._vdir(v)
            for name in os.listdir(vdir):
                if name.startswith("_BATCH_"):
                    open(os.path.join(self._vdir(base), name), "w").close()
            shutil.rmtree(vdir)
            removed.append(v)
        return removed

    # -- lifecycle --------------------------------------------------------

    def _write_base(self, version: int, res) -> None:
        vdir = self._vdir(version)
        res.conversations.write.mode("overwrite").parquet(f"{vdir}/conversations")
        res.representatives.write.mode("overwrite").parquet(
            f"{vdir}/representatives"
        )
        res.postings.write.mode("overwrite").parquet(f"{vdir}/postings")
        res.idf.write.mode("overwrite").parquet(f"{vdir}/idf")
        res.clusters.write.mode("overwrite").parquet(f"{vdir}/clusters")
        open(os.path.join(vdir, "_BASE"), "w").close()
        self._commit(version)

    def bootstrap(self, transcripts: DataFrame) -> None:
        """Full pipeline over the initial corpus → state version 0."""
        if self._committed_versions():
            raise ValueError(f"{self.state_dir} already bootstrapped")
        self._write_base(0, run_pipeline(transcripts, self.cfg))

    def refit(self, transcripts: DataFrame) -> None:
        """Re-bootstrap on the CURRENT full corpus → a new base version
        with a freshly-fit IDF; later micro-batches fold against it.

        This is the documented remedy for dictionary drift (plans/
        incremental.py step 3): the bootstrap-frozen IDF keeps old
        vectors valid but ages as the corpus grows — refit on a cadence,
        e.g. when the corpus has doubled. ``transcripts`` is the full raw
        corpus: state stores canonical conversations, not raw turns, so
        the caller supplies the stream's durable source table. The
        streaming query and its checkpoint keep running across a refit —
        replay protection is per batch_id (``_BATCH_*`` markers), not
        per version, so an in-flight batch replayed after the refit is
        still skipped."""
        committed = self._committed_versions()
        if not committed:
            raise ValueError("bootstrap() must commit v0 before refit")
        self._write_base(committed[-1] + 1, run_pipeline(transcripts, self.cfg))

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold one micro-batch of raw transcript turns
        into the persisted state (replay-idempotent, see module docstring).
        """
        committed = self._committed_versions()
        if not committed:
            raise ValueError("bootstrap() must run before streaming")
        self._base_of(committed)  # raises unless a committed base exists
        if int(batch_id) in self._applied_batch_ids():
            return  # failure replay of an already-applied batch
        version = committed[-1] + 1
        if batch_df.isEmpty():
            os.makedirs(self._vdir(version), exist_ok=True)
            open(
                os.path.join(self._vdir(version), f"_BATCH_{int(batch_id)}"), "w"
            ).close()
            self._commit(version)
            return

        base = self._base_of(committed)
        state_versions = [v for v in committed if v >= base]
        prev_conv = self._read_union("conversations", state_versions)
        prev_reps = self._read_union("representatives", state_versions)
        prev_post = self._read_union("postings", state_versions)
        prev_idf = self.spark.read.parquet(f"{self._vdir(base)}/idf")
        prev_clusters = self.read_clusters()

        inc = incremental_update(
            prev_conv,
            prev_reps,
            prev_idf,
            prev_post,
            prev_clusters,
            batch_df,
            self.cfg,
        )
        vdir = self._vdir(version)
        inc.new_conversations.write.mode("overwrite").parquet(
            f"{vdir}/conversations"
        )
        inc.new_representatives.write.mode("overwrite").parquet(
            f"{vdir}/representatives"
        )
        inc.new_postings.write.mode("overwrite").parquet(f"{vdir}/postings")
        inc.clusters.write.mode("overwrite").parquet(f"{vdir}/clusters")
        open(os.path.join(vdir, f"_BATCH_{int(batch_id)}"), "w").close()
        self._commit(version)

    def attach(
        self,
        stream: DataFrame,
        checkpoint_path: str,
        available_now: bool = True,
    ):
        """Wire a transcript-turn stream (sources like
        ``streaming.ingest.stream_transcripts``) into the state fold.
        ``available_now=True`` drains the backlog and stops (tests,
        backfills); False tails continuously."""
        writer = stream.writeStream.foreachBatch(self.apply_batch).option(
            "checkpointLocation", checkpoint_path
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
