"""Transactional two-phase-commit sink [FLINK-API:
o.a.f.streaming.api.functions.sink.TwoPhaseCommitSinkFunction].

Flink's exactly-once sink protocol: per checkpoint, `preCommit` stages
the writes into a transaction, and only on checkpoint-complete does
`commit` make them visible; a crash between the two leaves a staged-but-
invisible transaction that recovery resolves. This module carries that
protocol on Spark's micro-batch model:

- PHASE 1 (stage): inside foreachBatch, the batch's rows are written to
  ``<root>/stage/batch=<id>/`` — arbitrarily non-atomic, possibly torn,
  possibly repeated on retry (``mode("overwrite")`` makes the retry
  self-cleaning).
- PHASE 2 (commit): a manifest naming the staged parquet part-files is
  written to a dot-temp path and ``os.replace``d to
  ``<root>/commits/<id>.json`` — the ONE atomic step (POSIX rename).
  A batch is visible if and only if its manifest exists.

Readers (``committed_df``) resolve visibility through manifests only:
a crash BETWEEN stage and commit leaves staged files on disk that no
reader ever sees (no torn output), and the micro-batch replay after
restart re-stages and commits exactly once (no duplicates) — the test
injects a failure precisely between the phases and proves both. A
replay of an ALREADY-committed batch (crash after the manifest rename
but before Spark's offset log caught up) is a NO-OP: the manifest is
the idempotency marker, so the committed part-files are never
transiently deleted out from under a concurrent reader
(test_two_phase_sink.test_two_phase_commit_sink_post_commit_replay_is
_noop).

Contrast with the engine's default idempotent-overwrite sink
(jobs.file_sink_exactly_once): that one is simpler (no manifest — the
per-batch directory IS the unit) but a reader scanning the directory
tree mid-write can observe a torn batch; the 2PC manifest closes that
window at the cost of a manifest read on the consumer side. See
docs/divergences.md §two-phase-commit.
"""
from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession


class TwoPhaseCommitFileSink:
    """File-backed 2PC sink driven from foreachBatch."""

    def __init__(self, root: str):
        self.root = root
        self.stage_root = os.path.join(root, "stage")
        self.commit_root = os.path.join(root, "commits")
        os.makedirs(self.stage_root, exist_ok=True)
        os.makedirs(self.commit_root, exist_ok=True)

    # -- the foreachBatch body ----------------------------------------
    def write_batch(self, batch_df: DataFrame, batch_id: int,
                    fail_between_phases=None) -> None:
        """Stage then atomically commit one micro-batch.

        `fail_between_phases(batch_id)` is the test's fault injector —
        called AFTER the stage write and BEFORE the manifest commit
        (the exact window the protocol must survive)."""
        stage_dir = os.path.join(self.stage_root, f"batch={batch_id}")
        # POST-commit replay (crash after the manifest rename but before
        # Spark recorded the batch in its offset log): the manifest IS
        # the idempotency marker. Re-staging here would transiently
        # delete part-files the committed manifest still names — a
        # torn-read window for a concurrent committed_df() reader — so
        # an already-committed batch is a no-op.
        if os.path.exists(os.path.join(self.commit_root,
                                       f"{batch_id}.json")):
            return
        # phase 1: stage (overwrite → a retried batch re-stages cleanly)
        batch_df.write.mode("overwrite").parquet(stage_dir)
        if fail_between_phases is not None:
            fail_between_phases(batch_id)
        # phase 2: atomic commit — manifest names the exact part-files
        parts = sorted(
            os.path.relpath(p, self.root)
            for p in glob.glob(os.path.join(stage_dir, "part-*.parquet")))
        manifest = {"batch_id": batch_id, "files": parts}
        tmp = os.path.join(self.commit_root, f".{batch_id}.json.tmp")
        final = os.path.join(self.commit_root, f"{batch_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)  # THE atomic step

    def foreach_batch(self, fail_between_phases=None):
        def body(batch_df: DataFrame, batch_id: int) -> None:
            self.write_batch(batch_df, batch_id, fail_between_phases)
        return body

    # -- the reader side ------------------------------------------------
    def committed_batch_ids(self) -> list[int]:
        return sorted(
            int(os.path.basename(p)[:-len(".json")])
            for p in glob.glob(os.path.join(self.commit_root, "*.json")))

    def committed_files(self) -> list[str]:
        files: list[str] = []
        for p in sorted(glob.glob(os.path.join(self.commit_root, "*.json"))):
            with open(p) as f:
                files.extend(os.path.join(self.root, rel)
                             for rel in json.load(f)["files"])
        return files

    def committed_df(self, spark: SparkSession) -> DataFrame | None:
        """The transactionally visible view: ONLY manifest-listed files.
        Staged-but-uncommitted batches are invisible by construction."""
        files = self.committed_files()
        if not files:
            return None
        return spark.read.parquet(*files)

    def staged_uncommitted(self) -> list[int]:
        committed = set(self.committed_batch_ids())
        staged = {
            int(os.path.basename(d).split("=", 1)[1])
            for d in glob.glob(os.path.join(self.stage_root, "batch=*"))}
        return sorted(staged - committed)
