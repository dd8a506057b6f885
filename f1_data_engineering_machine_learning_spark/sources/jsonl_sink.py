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

    def commit(self, messages) -> None:
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f != "_staging":
                    p = os.path.join(self.path, f)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        shards = []
        for m in messages:
            os.replace(
                os.path.join(self.staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            shards.append({"file": m.filename, "n_rows": m.n_rows})
        # append mode MERGES this job's shard records into the existing
        # manifest so shards/total_rows keep describing the whole
        # directory, not just the last job's contribution. The merge is
        # a read-modify-write, so it runs under an exclusive-create lock
        # (the same POSIX CAS primitive versioned.py commits with):
        # two concurrent append jobs serialize here and neither job's
        # shard records are lost. Overwrite mode owns the directory and
        # takes the lock only to serialize the final manifest swap.
        self._with_manifest_lock(manifest_path, shards)
        shutil.rmtree(self.staging, ignore_errors=True)
        self._prune_staging_root()

    def _with_manifest_lock(self, manifest_path: str, shards: list) -> None:
        lock = manifest_path + ".lock"
        deadline = time.time() + 30.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                # steal locks a crashed committer abandoned
                try:
                    if time.time() - os.path.getmtime(lock) > 30.0:
                        os.remove(lock)
                        continue
                except OSError:
                    continue  # holder released between stat and remove
                if time.time() > deadline:
                    raise TimeoutError(
                        f"jsonlshards: manifest lock {lock} held > 30s"
                    )
                time.sleep(0.02)
        try:
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
            try:
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
