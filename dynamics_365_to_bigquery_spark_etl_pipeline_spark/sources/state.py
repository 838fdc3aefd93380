"""Watermark / offset state table (SURVEY.md §1.1 item 4, S3/S6, §2.6).

The reference keeps one watermark row per entity in a coalesced
``latest.csv`` and — its central reliability bug — advances ALL
watermarks once at the end of the run even when individual entities
failed (errors swallowed at ``incremental_etl_v1.py:193-195``, commit at
``incremental_etl_v1.py:201-202``), permanently skipping the failed
entity's files.

This store commits **per entity, after that entity's sink write
succeeds** (transactional order: data first, then offset), so a failed
entity simply retries from its old watermark on the next run —
at-least-once + idempotent overwrite = effectively exactly-once.

State lives as one JSON file per entity plus an atomic rename — the
moral equivalent of a streaming checkpoint's offset log. (A real
deployment would use Structured Streaming checkpoints or a
transactional table; this keeps the same semantics locally.)
"""

from __future__ import annotations

import json
import os
import tempfile


class WatermarkStore:
    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, entity: str) -> str:
        safe = "".join(ch for ch in entity if ch.isalnum() or ch in "-_").lower()
        return os.path.join(self.state_dir, f"{safe}.json")

    def get(self, entity: str) -> dict | None:
        """Returns {"latest_file": str, "max_mtime": float} or None."""
        try:
            with open(self._path(entity)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit(self, entity: str, latest_file: str, max_mtime: float) -> None:
        """Atomic per-entity commit (write temp + rename)."""
        payload = {"latest_file": latest_file, "max_mtime": max_mtime}
        fd, tmp = tempfile.mkstemp(dir=self.state_dir)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, self._path(entity))
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def entities(self) -> list[str]:
        return sorted(
            n[: -len(".json")] for n in os.listdir(self.state_dir) if n.endswith(".json")
        )
