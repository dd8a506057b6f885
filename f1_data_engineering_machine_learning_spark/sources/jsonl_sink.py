"""Spark Python DataSource WRITER: transactional JSONL shard sink.

The write-side counterpart of the ``f1results`` reader — together they
exercise the full PySpark 4 Python DataSource surface (S-tier custom
connectors without a JVM build). Pattern: each write TASK streams its
partition to a private file under ``_staging/`` and returns a commit
message (file name, row count); the driver PROMOTES staged files into
place and writes a ``_MANIFEST.json`` only in ``commit()`` — so readers
either see the complete output of a successful job or nothing. A failed
or speculated task never pollutes the output (its file stays in staging;
``abort()`` sweeps it), which is exactly the two-phase contract file
sinks need under retries.

Usage::

    df.write.format("jsonlshards").mode("overwrite") \\
      .option("path", "/data/out").save()

The manifest records per-shard row counts — the audit a downstream
loader checks before trusting the directory (cf.
plans/export.py::write_with_audit, which rides metrics on a native
write; this sink OWNS the commit protocol instead).

Deployment contract: ``path`` must be a SHARED filesystem visible to
every executor AND the driver (NFS, fuse-mounted object storage, or
local mode) — tasks stage with plain ``open()`` and the driver promotes
with ``os.replace``. On raw S3/HDFS the same two-phase shape holds but
staging/promotion go through that store's client and its rename
semantics; this file is the protocol reference, not a cloud driver.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires .option('path', ...)")
        self.overwrite = overwrite
        # per-JOB staging subdirectory: commit/abort sweep only THIS
        # job's staged files, so a concurrent writer into the same path
        # never has its in-flight shards clobbered by another job's
        # cleanup (the job id is minted once on the driver and ships to
        # tasks inside the pickled writer)
        self.job_id = uuid.uuid4().hex
        self.staging = os.path.join(self.path, "_staging", self.job_id)

    def write(self, rows: Iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.staging, name), "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return ShardCommit(name, n)

    #: a lock is only STOLEN once it is this stale — far above any
    #: plausible promote+merge critical section, so a live-but-slow
    #: holder (large manifest on NFS) is never displaced; the holder
    #: additionally refreshes the lock mtime mid-critical-section
    STEAL_AFTER = 300.0
    #: waiters give up after this long. Strictly GREATER than
    #: STEAL_AFTER so crash recovery (stealing a dead committer's lock)
    #: fires before the waiter times out.
    WAIT_DEADLINE = 330.0

    def commit(self, messages) -> None:
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        lock = manifest_path + ".lock"
        # Promotion AND the manifest read-modify-write both happen under
        # the exclusive-create lock (the same POSIX CAS primitive
        # versioned.py commits with). Two consequences:
        #   1. concurrent append jobs serialize, so neither job's shard
        #      records are lost in the manifest merge;
        #   2. if the lock cannot be acquired, NOTHING has been promoted
        #      yet — the all-or-nothing contract holds (no
        #      committed-looking .jsonl files that no manifest records).
        self._acquire_lock(lock)
        try:
            if self.overwrite:
                for f in os.listdir(self.path):
                    if f != "_staging" and not f.startswith(
                        "_MANIFEST.json.lock"
                    ):
                        p = os.path.join(self.path, f)
                        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
            shards = []
            for m in messages:
                os.replace(
                    os.path.join(self.staging, m.filename),
                    os.path.join(self.path, m.filename),
                )
                shards.append({"file": m.filename, "n_rows": m.n_rows})
            # heartbeat: promoting many shards can be slow — refresh the
            # lock mtime so a waiter never mistakes us for a crashed
            # committer mid-critical-section
            try:
                os.utime(lock)
            except OSError:
                pass
            if not self.overwrite and os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    shards = json.load(fh).get("shards", []) + shards
            tmp = manifest_path + f".{self.job_id}.tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "shards": shards,
                        "total_rows": sum(s["n_rows"] for s in shards),
                    },
                    fh,
                )
            os.replace(tmp, manifest_path)  # atomic swap — no torn reads
        finally:
            self._release_lock(lock)
        shutil.rmtree(self.staging, ignore_errors=True)
        self._prune_staging_root()

    def _acquire_lock(self, lock: str) -> None:
        """Exclusive-create lock with crash recovery.

        Stealing is ATOMIC per lock incarnation: a stale lock is claimed
        by ``os.replace``-ing it to a stealer-unique name, so of N racing
        stealers exactly one wins (the rest get FileNotFoundError and
        re-loop). The winner verifies by inode that what it displaced is
        the same stale file it statted; if a release+re-acquire slipped
        into that window (ABA), the displaced FRESH lock is restored via
        ``os.link`` (which itself fails harmlessly if an even newer lock
        already exists). This closes the unlink race where two waiters
        could both enter the critical section."""
        deadline = time.monotonic() + self.WAIT_DEADLINE
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, self.job_id.encode())
                finally:
                    os.close(fd)
                return
            except FileExistsError:
                try:
                    st = os.stat(lock)
                    if time.time() - st.st_mtime > self.STEAL_AFTER:
                        stolen = lock + f".stale.{uuid.uuid4().hex}"
                        try:
                            os.replace(lock, stolen)
                        except FileNotFoundError:
                            continue  # another stealer won — re-loop
                        st2 = os.stat(stolen)
                        if (
                            st2.st_ino != st.st_ino
                            and time.time() - st2.st_mtime <= self.STEAL_AFTER
                        ):
                            # ABA: we displaced a fresh lock — put it back
                            try:
                                os.link(stolen, lock)
                            except OSError:
                                pass
                        os.remove(stolen)
                        continue
                except OSError:
                    continue  # lock released between stat and steal
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"jsonlshards: manifest lock {lock} held > "
                        f"{self.WAIT_DEADLINE:.0f}s"
                    )
                time.sleep(0.02)

    def _release_lock(self, lock: str) -> None:
        """Remove the lock only if WE still own it (owner id re-verified)
        — a holder whose lock was stolen after a long stall must not
        unlink the thief's fresh lock."""
        try:
            with open(lock) as fh:
                if fh.read() != self.job_id:
                    return
            os.remove(lock)
        except OSError:
            pass

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)
        self._prune_staging_root()

    def _prune_staging_root(self) -> None:
        """Remove the shared _staging root only once no job is using it."""
        try:
            os.rmdir(os.path.join(self.path, "_staging"))
        except OSError:
            pass  # other jobs' subdirectories still staged — leave it


class JsonlShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlShardsDataSource)
