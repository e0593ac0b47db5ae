"""Structured metric writing: stdout + JSONL (SURVEY.md §5 metrics row).

The reference printed step loss / eval accuracy to stdout; this writer
keeps that human-readable line and adds an append-only JSONL stream per
run so dashboards/benchmark tooling can consume training curves.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


class MetricWriter:
    def __init__(self, jsonl_path: Optional[str] = None, stream: TextIO = sys.stdout):
        self._stream = stream
        self._f = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._f = open(jsonl_path, "a", encoding="utf-8")

    def write(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("time", time.time())
        parts = []
        for k, v in record.items():
            if k == "time":
                continue
            parts.append(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}")
        print("[sse] " + " ".join(parts), file=self._stream, flush=True)
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
