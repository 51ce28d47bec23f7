"""Atomic incremental-cursor state persistence.

Capability parity with /root/reference/src/data_extractor/state.py:30-77:
a JSON file mapping pipeline name -> last cursor value, written via
temp-file + atomic rename; corrupt/missing files reset to ``{}``. At
cluster scale the same interface can be backed by a 1-row table per
pipeline; the driver-side JSON file is correct for a single orchestrator.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any


class StateManager:
    def __init__(self, path: str | Path = ".pipeline_state.json") -> None:
        self.path = Path(path)

    def _read_all(self) -> dict[str, Any]:
        try:
            with open(self.path, "r", encoding="utf-8") as fh:
                data = json.load(fh)
            return data if isinstance(data, dict) else {}
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def get(self, pipeline: str, default: Any = None) -> Any:
        return self._read_all().get(pipeline, default)

    def set(self, pipeline: str, cursor: Any) -> None:
        # numpy / pandas scalars -> native JSON types
        if hasattr(cursor, "item"):
            cursor = cursor.item()
        if hasattr(cursor, "isoformat"):
            cursor = cursor.isoformat()
        data = self._read_all()
        data[pipeline] = cursor
        self.path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=str(self.path.parent), prefix=self.path.name, suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(data, fh, indent=2, default=str)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def clear(self, pipeline: str | None = None) -> None:
        if pipeline is None:
            if self.path.exists():
                self.path.unlink()
            return
        data = self._read_all()
        data.pop(pipeline, None)
        fd, tmp = tempfile.mkstemp(dir=str(self.path.parent), prefix=self.path.name)
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                json.dump(data, fh, indent=2, default=str)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
