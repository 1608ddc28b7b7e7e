"""Incremental sync state management (the reference's roadmap item
"Incremental sync state management" / "State management for incremental
loads", reference README.md:123,532 — implemented here).

A JSON state store keeps one high watermark per source. On each run the
watermark is passed to the API as a query parameter (``since=...``) so
only new/changed rows transfer; after a successful sink write the
watermark advances to the max cursor value observed. Combined with the
merge-by-PK sink this yields incremental, idempotent syncs: re-running
after a failure re-fetches at most one increment and upserts it.

The store is a local JSON file (atomic tmp+rename). At cluster scale the
same interface fronts a table/object-store key — the runner only calls
``get``/``advance``.
"""

from __future__ import annotations

import json
import os
import tempfile


class PipelineState:
    def __init__(self, path: str):
        self.path = path
        self._state: dict = {}
        if os.path.exists(path):
            with open(path) as fh:
                self._state = json.load(fh)

    def get(self, source_name: str):
        """Last high watermark for a source, or None on first sync."""
        return self._state.get(source_name, {}).get("last_value")

    def advance(self, source_name: str, cursor_field: str, value) -> None:
        """Persist a new high watermark (only moves forward)."""
        cur = self.get(source_name)
        if cur is not None and not self._greater(value, cur):
            return
        self._state[source_name] = {"cursor_field": cursor_field, "last_value": value}
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".", suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(self._state, fh, indent=2, default=str)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @staticmethod
    def _greater(a, b) -> bool:
        try:
            return a > b
        except TypeError:
            return str(a) > str(b)
