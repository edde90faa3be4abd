"""Run-level lineage events around maintenance entrypoints.

The reference wraps every CLI lane in an OpenLineage run:
START when the lane begins, COMPLETE/FAIL when it ends, with the failure
exception attached (/root/reference/ofl/cli.py:216-219,
/root/reference/ofl/platform/lineage.py:19-56). Frost's analogue writes the
same event pairs as JSON lines next to the checkpoint ledger — no external
lineage server exists in this environment, and a file is the honest
equivalent: every event carries ``run_id`` so downstream tooling can pair
START with its terminal event, exactly like OpenLineage's runId.

The file-granularity lineage (which file went into which rewrite) lives in
``plans.ledger``; this module covers the RUN granularity above it.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager

RUNS_FILE = "runs.jsonl"


class RunLog:
    """Append-only run-event log (one JSON object per line)."""

    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, RUNS_FILE)

    def _emit(self, event: dict) -> None:
        # single write + flush of one line: concurrent emitters interleave
        # at line granularity on POSIX O_APPEND semantics
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(event, default=str) + "\n")
            f.flush()

    @contextmanager
    def run(self, job: str, facets: dict | None = None):
        """Wrap a lane: START on entry; COMPLETE with the summary dict the
        body filled in, or FAIL carrying the exception — which re-raises
        (lineage records failures, it never swallows them)."""
        run_id = uuid.uuid4().hex
        base = {"run_id": run_id, "job": job, **(facets or {})}
        self._emit({**base, "event": "START",
                    "timestamp_ms": int(time.time() * 1000)})
        summary: dict = {}
        try:
            yield summary
        except BaseException as e:
            self._emit({**base, "event": "FAIL", "error": repr(e),
                        "timestamp_ms": int(time.time() * 1000)})
            raise
        self._emit({**base, "event": "COMPLETE", "summary": summary,
                    "timestamp_ms": int(time.time() * 1000)})

    def events(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    def runs_df(self, spark):
        """The run log as a DataFrame (queryable through the SQL door)."""
        rows = [
            (e["run_id"], e["job"], e["event"], e["timestamp_ms"],
             e.get("error"), json.dumps(e.get("summary", {}), default=str))
            for e in self.events()
        ]
        return spark.createDataFrame(
            rows, "run_id string, job string, event string, "
                  "timestamp_ms long, error string, summary string")
