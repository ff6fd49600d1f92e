"""Shared offline JSON-lines fallback for the external metric sinks.

Both the W&B and AzureML sinks degrade to this writer when their SDK is
absent (this image ships neither), so the offline protocol — a line-
buffered jsonl file opened under ``<log_dir>/<subdir>/``, a ``run_start``
header record, float-coerced scalar rows keyed by step — exists once.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class OfflineJsonlWriter:
    def __init__(self, log_dir: str, subdir: str, filename: str,
                 header: Optional[dict] = None):
        path = os.path.join(log_dir, subdir)
        os.makedirs(path, exist_ok=True)
        self._file = open(os.path.join(path, filename), "a",
                          buffering=1, encoding="utf-8")
        self._file.write(json.dumps(
            {"_type": "run_start", "time": time.time(), **(header or {})},
            default=str) + "\n")

    def log(self, metrics: dict, step: int) -> None:
        self._file.write(json.dumps(
            {"step": int(step), **{k: float(v) for k, v in
                                   metrics.items()}}) + "\n")

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
