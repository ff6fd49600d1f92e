"""Weights & Biases sink (``fairseq/logging/progress_bar.py:77-99`` parity).

Uses the real ``wandb`` package when it is installed; otherwise falls back
to an offline JSON-lines run directory (``<dir>/wandb_offline/run.jsonl``)
with the same ``log(dict, step)`` surface — so recipes that pass
``--wandb-project`` degrade gracefully in hermetic environments (this image
does not ship wandb).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class WandBLogger:
    def __init__(self, project: Optional[str], run_name: Optional[str] = None,
                 config: Optional[dict] = None, log_dir: str = "."):
        self._wandb = None
        self._file = None
        if not project:
            return
        try:
            import wandb  # type: ignore

            self._wandb = wandb
            wandb.init(project=project, name=run_name, config=config or {})
        except ImportError:
            path = os.path.join(log_dir, "wandb_offline")
            os.makedirs(path, exist_ok=True)
            self._file = open(os.path.join(path, "run.jsonl"), "a",
                              buffering=1, encoding="utf-8")
            self._file.write(json.dumps(
                {"_type": "run_start", "project": project, "name": run_name,
                 "config": config or {}, "time": time.time()},
                default=str) + "\n")

    def log(self, metrics: dict, step: int) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        elif self._file is not None:
            self._file.write(json.dumps(
                {"step": int(step), **{k: float(v) for k, v in
                                       metrics.items()}}) + "\n")

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        elif self._file is not None:
            self._file.close()
            self._file = None
