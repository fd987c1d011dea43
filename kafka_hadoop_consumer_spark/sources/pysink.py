"""``arrow_sink`` — a custom Python DataSource WRITER (Spark 4
DataSource API), batch and streaming.

This completes the reference's file-sink contract (SURVEY.md §2A A6:
the Hadoop job wrote Kafka payloads to HDFS part-files via an
OutputFormat + FileOutputCommitter) inside the SAME custom-source API
that ``kafka_sim`` uses for the read side, so the repo demonstrates the
full Python DataSource surface: reader, stream reader, writer, stream
writer.

Commit protocol — the part that matters on a 1000-executor cluster:

- each write task streams its partition's Arrow record batches into a
  UNIQUE staging file (``_staging/<uuid>.parquet``; retried or
  speculative task attempts get different names and can never collide
  or tear a committed file);
- the task returns (staging path, row count) as its commit message —
  a few bytes per task, never data;
- ONLY the driver-side ``commit()`` publishes: every staged file is
  renamed into the target directory and a ``_SUCCESS`` manifest lists
  exactly the published files with their row counts. Readers see the
  complete committed set or nothing — the all-or-nothing semantics the
  reference delegated to HDFS's FileOutputCommitter (v1 algorithm:
  task-attempt dirs + driver rename);
- ``abort()`` deletes the staged files, leaving prior committed data
  untouched.

The streaming writer adds idempotent-replay exactly-once on top: each
micro-batch publishes under deterministic (batchId, ordinal) names and
then records a ``_commits/<batchId>`` marker. A replayed batch with the
marker present publishes nothing; a replay that finds the marker ABSENT
(crash between the renames and the marker write) first removes any
partial prior attempt for that batchId and republishes, so the
committed directory always converges to exactly one copy of every
batch — duplicates are impossible in the final state.

Files are parquet (written by pyarrow from the Arrow batches Spark
hands the writer — zero row-level Python work), so the committed
directory is directly re-readable by ``spark.read.parquet`` and by
DuckDB, which is what makes the roundtrip key fully SQL-oracle-able.
On a real cluster the ``os.replace`` calls become HDFS/S3 renames
(single-object rename is atomic on HDFS; on S3 use a manifest-only
commit, same message shape).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import uuid
from typing import Iterator, List, Optional

from pyspark import cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

# writer tasks ship to executor python workers, which do not inherit the
# driver's sys.path — serialize this module by value (same as kafka_sim)
cloudpickle.register_pickle_by_value(sys.modules[__name__])

SUCCESS_FILE = "_SUCCESS"


@dataclasses.dataclass
class StagedFile(WriterCommitMessage):
    staged_path: str
    rows: int


# every live staging task re-touches its job's staging-dir mtime this
# often, so the stale-sibling reaper's age gate sees a young dir even
# while a straggler task computes upstream for minutes before its first
# Arrow batch arrives (ParquetWriter only creates the file on the first
# batch, so file mtimes alone would not advance)
HEARTBEAT_SECS = 30.0


def _stage_batches(staging_dir: str, iterator) -> Optional[StagedFile]:
    """Stream one task's Arrow batches into a unique staging parquet
    file; empty partitions stage nothing (no 0-row files to publish).
    A daemon heartbeat keeps the staging dir's mtime young for the
    task's whole lifetime — including the pre-first-batch compute —
    so ``_reap_stale_siblings``'s age gate never fires on a live job;
    a crashed task's heartbeat dies with its worker process, letting
    the orphaned dir age out normally."""
    import threading

    import pyarrow.parquet as pq

    # a concurrent job's _reap_staging may rmdir the shared _staging
    # parent between this makedirs' two mkdir steps — exist_ok only
    # suppresses FileExistsError, so retry the rare FileNotFoundError
    for _ in range(3):
        try:
            os.makedirs(staging_dir, exist_ok=True)
            break
        except FileNotFoundError:
            continue
    else:
        os.makedirs(staging_dir, exist_ok=True)

    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(HEARTBEAT_SECS):
            try:
                os.utime(staging_dir)
            except OSError:
                return  # dir reaped by our own abort: nothing to keep alive

    threading.Thread(target=_beat, daemon=True).start()
    path = os.path.join(staging_dir, f"{uuid.uuid4().hex}.parquet")
    writer, rows = None, 0
    try:
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
    finally:
        stop.set()
        if writer is not None:
            writer.close()
    if writer is None:
        return None
    return StagedFile(staged_path=path, rows=rows)


def _publish(target: str, messages: List[Optional[StagedFile]],
             prefix: str = "part") -> List[dict]:
    """Driver-side rename of every staged file into ``target``; returns
    the manifest entries. Deterministic final names (ordinal per task
    slot) so a listing is stable across reruns of the same data."""
    entries = []
    for i, m in enumerate(messages):
        if m is None:
            continue
        final = os.path.join(target, f"{prefix}-{i:05d}.parquet")
        os.replace(m.staged_path, final)
        entries.append({"file": os.path.basename(final), "rows": m.rows})
    return entries


# a sibling staging dir this much older than "now" (newest entry inside
# it included) is treated as a crashed run's orphan — every LIVE task
# heartbeats its dir's mtime (HEARTBEAT_SECS, well inside this gate)
# even while computing upstream of its first batch, while an orphan's
# heartbeats died with its process and it only ages
STALE_STAGING_SECS = 300.0


def _reap_stale_siblings(staging_parent: str, own: str,
                         max_age: float = STALE_STAGING_SECS) -> None:
    """Reclaim sibling staging dirs orphaned by a CRASHED driver — one
    whose commit()/abort() never ran, so the per-instance reap never
    fired. The batch writer's overwrite-mode commit already sweeps
    siblings unconditionally (it owns the target); the streaming writer
    calls this at each commit, once its ``_commits`` marker proves this
    query owns the sink, with an age gate so a concurrent mid-batch
    writer (whose live tasks heartbeat the dir mtime — see
    ``_stage_batches``) is never touched."""
    import time

    try:
        siblings = os.listdir(staging_parent)
    except OSError:
        return
    now = time.time()
    for name in siblings:
        d = os.path.join(staging_parent, name)
        if d == own or not os.path.isdir(d):
            continue
        try:
            newest = os.path.getmtime(d)
            for f in os.listdir(d):
                newest = max(newest, os.path.getmtime(os.path.join(d, f)))
        except OSError:
            continue  # racing a live writer or another sweep: skip
        if now - newest > max_age:
            shutil.rmtree(d, ignore_errors=True)


def _reap_staging_dir(staging: str) -> None:
    """Remove one writer's scoped staging dir — including partial files
    from tasks that crashed before returning a commit message — then
    drop the shared ``_staging`` parent if no other writer is using it.

    On abort, tasks the scheduler is still tearing down can race the
    sweep (a file created between rmtree's listdir and its rmdir leaves
    the dir behind with ENOTEMPTY silently ignored), so retry briefly
    until the dir stays gone; killed tasks stop creating files within
    milliseconds, and an open handle to an already-unlinked file keeps
    writing to the orphaned inode without resurrecting the directory."""
    import time

    # 5 s ceiling: under a contended 32-thread session a cancelled
    # pandas-UDF worker can take >2 s to stop staging (r9 flake); the
    # loop exits on the first clean check, so the normal cost is one
    # rmtree + one exists()
    for attempt in range(25):
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(staging):
            break
        time.sleep(0.2)
    try:
        os.rmdir(os.path.dirname(staging))
    except OSError:
        pass


class ArrowSinkWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        # per-JOB publish prefix: append jobs must never reuse a prior
        # job's final names (deterministic part-{i} names starting at 0
        # would silently os.replace an earlier append's files)
        self.job_id = uuid.uuid4().hex[:12]
        # staging is job-scoped too: abort()/commit() can then reap the
        # WHOLE job dir — including partial files from tasks that crashed
        # mid-stage and never returned a commit message — without ever
        # touching a concurrent job's staged files on the same target.
        # A dir orphaned by a CRASHED driver (no commit/abort ran) is
        # invisible to readers (underscore prefix) and is reclaimed by
        # the next overwrite-mode commit below.
        self.staging_parent = os.path.join(self.path, "_staging")
        self.staging = os.path.join(self.staging_parent, self.job_id)

    def write(self, iterator) -> Optional[StagedFile]:
        return _stage_batches(self.staging, iterator)

    def commit(self, messages: List[Optional[StagedFile]]) -> None:
        manifest_path = os.path.join(self.path, SUCCESS_FILE)
        prior: List[dict] = []
        if self.overwrite:
            for f in os.listdir(self.path):
                if f != "_staging":
                    full = os.path.join(self.path, f)
                    shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
            # overwrite owns the target: also sweep OTHER writers' staging
            # dirs — the one reclamation point for dirs orphaned by a
            # crashed driver (no commit/abort ever ran for them), the same
            # role FileOutputCommitter's _temporary cleanup plays. A live
            # concurrent writer to an overwritten target is already
            # semantically broken, so sweeping it loses nothing durable.
            for f in os.listdir(self.staging_parent) if os.path.isdir(
                    self.staging_parent) else ():
                if f != self.job_id:
                    shutil.rmtree(
                        os.path.join(self.staging_parent, f),
                        ignore_errors=True,
                    )
        elif os.path.exists(manifest_path):
            # append: keep the committed set and extend its manifest
            with open(manifest_path) as fh:
                prior = json.load(fh).get("files", [])
        entries = _publish(
            self.path, messages, prefix=f"part-{self.job_id}"
        )
        with open(manifest_path, "w") as fh:
            json.dump({"files": prior + entries}, fh)
        _reap_staging_dir(self.staging)

    def abort(self, messages: List[Optional[StagedFile]]) -> None:
        # every staged file — message-listed or orphaned by a task that
        # died mid-stage — lives inside this job's staging dir; one reap
        # covers both
        _reap_staging_dir(self.staging)


class ArrowSinkStreamWriter(DataSourceStreamArrowWriter):
    """Micro-batch sink with idempotent-replay exactly-once (§2A A6+A7):
    a replayed batchId is detected by its ``_commits/<batchId>`` marker
    and publishes nothing."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        # instance-scoped staging (same rationale as the batch writer's
        # job scoping): micro-batches of one query are sequential, so at
        # commit(batchId) time every file in this dir belongs to that
        # batch — one reap per commit also sweeps partials from task
        # attempts that died before returning a commit message, and a
        # concurrent query writing the same path can never be swept
        # (its live tasks heartbeat their staging dir past the stale
        # age gate; see _stage_batches)
        self.staging_parent = os.path.join(self.path, "_staging")
        self.staging = os.path.join(self.staging_parent, uuid.uuid4().hex[:12])
        self.commits = os.path.join(self.path, "_commits")

    def write(self, iterator) -> Optional[StagedFile]:
        return _stage_batches(self.staging, iterator)

    def commit(self, messages: List[Optional[StagedFile]], batchId: int) -> None:
        os.makedirs(self.commits, exist_ok=True)
        marker = os.path.join(self.commits, str(batchId))
        if os.path.exists(marker):  # replay after crash: already published
            # the replayed batch's tasks re-ran under THIS instance, so
            # its staged files all live in self.staging — one reap
            _reap_staging_dir(self.staging)
            _reap_stale_siblings(self.staging_parent, self.staging)
            return
        # The marker lands AFTER the renames, so a crash in between makes
        # the NEXT replay re-enter here; it must converge to exactly the
        # replayed batch's files. Deterministic (batchId, ordinal) names
        # make the renames overwrite a prior partial attempt, and any
        # higher-ordinal leftovers from an attempt that staged MORE task
        # files (source repartitioning between attempts) are removed
        # first — so the committed state is exactly-once even though the
        # two steps aren't atomic. (On HDFS/S3 swap this for a
        # manifest-only commit: readers then never see the brief
        # mid-replay partial state either.)
        prefix = f"batch-{batchId:08d}"
        for f in os.listdir(self.path):
            if f.startswith(prefix):
                os.remove(os.path.join(self.path, f))
        entries = _publish(self.path, messages, prefix=prefix)
        with open(marker, "w") as fh:
            json.dump({"files": entries}, fh)
        _reap_staging_dir(self.staging)
        # marker written -> this query owns the sink: reclaim staging
        # dirs orphaned by a prior crashed run (age-gated; r8 advice)
        _reap_stale_siblings(self.staging_parent, self.staging)

    def abort(self, messages: List[Optional[StagedFile]], batchId: int) -> None:
        _reap_staging_dir(self.staging)


class ArrowSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "arrow_sink"

    def writer(self, schema, overwrite: bool) -> ArrowSinkWriter:
        os.makedirs(self.options["path"], exist_ok=True)
        return ArrowSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> ArrowSinkStreamWriter:
        os.makedirs(self.options["path"], exist_ok=True)
        return ArrowSinkStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the entry)."""
    spark.dataSource.register(ArrowSinkDataSource)
