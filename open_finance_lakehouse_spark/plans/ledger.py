"""Checkpoint + lineage ledger: file-granularity resume for maintenance jobs.

Why this exists (north_rule): an interrupted rewrite must resume without
re-decoding completed partitions. Delta gives the reference this for free via
``txnAppId``/``txnVersion`` (/root/reference/ofl/streaming/bronze.py:185-194 —
a replayed micro-batch is a no-op); our table format has no transaction
ledger, so the engine keeps its own: one record per
``(job_id, table, partition_id)`` (FIXTURES.md §2 grain) whose
``file_set_hash`` fingerprints the *input* file list. The planner consults
the ledger before rewriting: a partition whose record is ``committed`` with a
matching input hash is skipped — replay is a measured no-op, not an asserted
one (the reference's idempotence discipline,
/root/reference/tools/streaming_idempotence.py:17-23).

Storage is one JSON document per record, written atomically
(tmp + ``os.replace``, the reference's atomic-landing pattern,
/root/reference/ofl/streaming/paths.py:16-19). At cluster scale the ledger
directory lives on the shared filesystem/object store next to the table;
records are O(partitions), driver-side, and also exposed as a Spark
DataFrame for metrics queries.

Lineage records (FIXTURES.md §3) mirror the reference's universal lineage
columns (`source, ingested_at, load_id` on every row,
/root/reference/ofl/ingestion/landing.py:45-54) at *file* grain: which input
files produced which output file, under which operation and job.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import tempfile
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_DDL = (
    "job_id string, table string, partition_id string, file_set_hash string, "
    "status string, rows long, bytes_in long, bytes_out long, files_in long, "
    "files_out long, engine_ms long, committed_snapshot_id long, "
    "updated_at timestamp"
)

LINEAGE_DDL = (
    "job_id string, partition_id string, files_in array<string>, "
    "file_out string, op string, load_id string, ingested_at timestamp"
)

STATUS_PLANNED = "planned"
STATUS_REWRITING = "rewriting"
STATUS_COMMITTED = "committed"
# a concurrent writer took this partition's planned files out of the live
# set between planning and commit; the partition's staged output was
# discarded and the next run replans it against the new head (resume
# treats it exactly like an interrupted rewrite — only STATUS_COMMITTED
# with a matching fingerprint skips)
STATUS_CONFLICTED = "conflicted"


def file_set_hash(paths: list[str]) -> str:
    """Order-insensitive fingerprint of an input file list."""
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


@dataclass
class CheckpointRecord:
    job_id: str
    table: str
    partition_id: str
    file_set_hash: str
    status: str
    rows: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    files_in: int = 0
    files_out: int = 0
    engine_ms: int = 0
    committed_snapshot_id: int | None = None
    output_file_set_hash: str = ""
    updated_at_ms: int = field(default_factory=lambda: int(time.time() * 1000))


def _atomic_write_json(path: str, doc: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(doc, f, sort_keys=True)
        os.replace(tmp, path)  # atomic: readers never see a partial record
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _safe(name: str) -> str:
    safe = _old_safe(name)
    # Spark/Hadoop file indexes treat paths starting with "_" or "." as
    # HIDDEN metadata (like _SUCCESS) and silently exclude them — a
    # "__snapshots__-*.json" record would be invisible to
    # checkpoints_df/lineage_df while plain open() sees it fine
    return f"p{safe}" if safe[:1] in ("_", ".") else safe


def _old_safe(name: str) -> str:
    """Sanitization rule of builds that predate the hidden-path prefix —
    their records live under the unprefixed name and must still resolve
    (and migrate forward on the next upsert)."""
    return "".join(c if (c.isalnum() or c in "-_.") else "_" for c in name)


class CheckpointLedger:
    def __init__(self, root: str):
        self.root = root

    # -------------------------------------------------------- checkpoints

    def _ckpt_path(self, job_id: str, partition_id: str) -> str:
        return os.path.join(
            self.root, "checkpoints", _safe(job_id), f"{_safe(partition_id)}.json"
        )

    def _legacy_ckpt_path(self, job_id: str, partition_id: str) -> str | None:
        """Where a pre-prefix build would have written this record, or
        None when the old and new rules agree (no migration needed)."""
        p = os.path.join(self.root, "checkpoints", _old_safe(job_id),
                         f"{_old_safe(partition_id)}.json")
        return p if p != self._ckpt_path(job_id, partition_id) else None

    def upsert(self, rec: CheckpointRecord) -> None:
        rec.updated_at_ms = int(time.time() * 1000)
        _atomic_write_json(self._ckpt_path(rec.job_id, rec.partition_id),
                           asdict(rec))
        legacy = self._legacy_ckpt_path(rec.job_id, rec.partition_id)
        if legacy and os.path.exists(legacy):
            # migrate: the stale pre-prefix record would otherwise shadow
            # this upsert for directory-globbing readers forever
            os.remove(legacy)
            try:
                os.rmdir(os.path.dirname(legacy))
            except OSError:
                pass  # other records still live there

    def get(self, job_id: str, partition_id: str) -> CheckpointRecord | None:
        p = self._ckpt_path(job_id, partition_id)
        if not os.path.exists(p):
            legacy = self._legacy_ckpt_path(job_id, partition_id)
            if not (legacy and os.path.exists(legacy)):
                return None
            p = legacy
        with open(p, encoding="utf-8") as f:
            return CheckpointRecord(**json.load(f))

    def records(self, job_id: str | None = None) -> list[CheckpointRecord]:
        base = os.path.join(self.root, "checkpoints")
        out: list[CheckpointRecord] = []
        if not os.path.isdir(base):
            return out
        jobs = [_safe(job_id)] if job_id else sorted(os.listdir(base))
        for j in jobs:
            jd = os.path.join(base, j)
            if not os.path.isdir(jd):
                continue
            for n in sorted(os.listdir(jd)):
                if n.endswith(".json"):
                    with open(os.path.join(jd, n), encoding="utf-8") as f:
                        out.append(CheckpointRecord(**json.load(f)))
        return out

    def is_committed(self, job_id: str, partition_id: str, fingerprint: str) -> bool:
        """True iff this partition's rewrite already committed for the same
        input file set — the resume-skip decision."""
        rec = self.get(job_id, partition_id)
        return (
            rec is not None
            and rec.status == STATUS_COMMITTED
            and (rec.file_set_hash == fingerprint
                 or (rec.output_file_set_hash
                     and rec.output_file_set_hash == fingerprint))
        )

    def checkpoints_df(self, spark: SparkSession, job_id: str | None = None
                       ) -> DataFrame:
        """Checkpoint records as a Spark relation, read DISTRIBUTEDLY from
        the JSON documents (at O(partitions) records per job the metrics
        queries must not funnel through the driver — `records()` stays the
        driver-side planner surface for single lookups)."""
        from pyspark.sql import functions as F

        base = os.path.join(self.root, "checkpoints")
        if job_id is not None:
            base = os.path.join(base, _safe(job_id))
        if not os.path.isdir(base):
            return spark.createDataFrame([], CHECKPOINT_DDL)
        raw_ddl = (
            "job_id string, table string, partition_id string, "
            "file_set_hash string, status string, rows long, bytes_in long, "
            "bytes_out long, files_in long, files_out long, engine_ms long, "
            "committed_snapshot_id long, output_file_set_hash string, "
            "updated_at_ms long"
        )
        pattern = (os.path.join(base, "*.json") if job_id is not None
                   else os.path.join(base, "*", "*.json"))
        if not glob.glob(pattern):
            # an existing-but-empty dir (crash between makedirs and the
            # atomic rename) must honor the empty-relation contract —
            # Spark throws PATH_NOT_FOUND on an unmatched glob
            return spark.createDataFrame([], CHECKPOINT_DDL)
        return (
            spark.read.schema(raw_ddl).json(pattern)
            .withColumn("updated_at",
                        F.timestamp_millis(F.col("updated_at_ms")))
            .select(*[c.split()[0] for c in CHECKPOINT_DDL.split(", ")])
        )

    # ------------------------------------------------------------ lineage

    def append_lineage(
        self,
        job_id: str,
        partition_id: str,
        files_in: list[str],
        files_out: list[str],
        op: str,
    ) -> str:
        """One lineage row per output file (FIXTURES.md §3 grain)."""
        load_id = uuid.uuid4().hex
        now = int(time.time() * 1000)
        doc = {
            "load_id": load_id,
            "rows": [
                {
                    "job_id": job_id,
                    "partition_id": partition_id,
                    "files_in": sorted(files_in),
                    "file_out": fo,
                    "op": op,
                    "load_id": load_id,
                    "ingested_at_ms": now,
                }
                for fo in sorted(files_out)
            ],
        }
        path = os.path.join(
            self.root, "lineage", _safe(job_id),
            f"{_safe(partition_id)}-{load_id}.json",
        )
        _atomic_write_json(path, doc)
        return load_id

    def lineage_rows(self, job_id: str | None = None) -> list[dict]:
        base = os.path.join(self.root, "lineage")
        out: list[dict] = []
        if not os.path.isdir(base):
            return out
        jobs = [_safe(job_id)] if job_id else sorted(os.listdir(base))
        for j in jobs:
            jd = os.path.join(base, j)
            if not os.path.isdir(jd):
                continue
            for n in sorted(os.listdir(jd)):
                if n.endswith(".json"):
                    with open(os.path.join(jd, n), encoding="utf-8") as f:
                        out.extend(json.load(f)["rows"])
        return out

    def lineage_df(self, spark: SparkSession, job_id: str | None = None
                   ) -> DataFrame:
        """Lineage rows as a Spark relation (distributed JSON read +
        explode — one row per output file, FIXTURES.md §3 grain)."""
        from pyspark.sql import functions as F

        base = os.path.join(self.root, "lineage")
        if job_id is not None:
            base = os.path.join(base, _safe(job_id))
        if not os.path.isdir(base):
            return spark.createDataFrame([], LINEAGE_DDL)
        raw_ddl = (
            "load_id string, rows array<struct<job_id:string,"
            "partition_id:string,files_in:array<string>,file_out:string,"
            "op:string,load_id:string,ingested_at_ms:long>>"
        )
        pattern = (os.path.join(base, "*.json") if job_id is not None
                   else os.path.join(base, "*", "*.json"))
        if not glob.glob(pattern):
            return spark.createDataFrame([], LINEAGE_DDL)
        return (
            spark.read.schema(raw_ddl).json(pattern)
            .select(F.explode("rows").alias("r"))
            .select(
                F.col("r.job_id").alias("job_id"),
                F.col("r.partition_id").alias("partition_id"),
                F.col("r.files_in").alias("files_in"),
                F.col("r.file_out").alias("file_out"),
                F.col("r.op").alias("op"),
                F.col("r.load_id").alias("load_id"),
                F.timestamp_millis(F.col("r.ingested_at_ms"))
                .alias("ingested_at"),
            )
        )
