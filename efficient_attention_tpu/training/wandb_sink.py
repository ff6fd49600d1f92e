"""Weights & Biases sink (``fairseq/logging/progress_bar.py:77-99`` parity).

Uses the real ``wandb`` package when it is installed; otherwise falls back
to the shared offline JSON-lines writer
(``<dir>/wandb_offline/run.jsonl``) with the same ``log(dict, step)``
surface — so recipes that pass ``--wandb-project`` degrade gracefully in
hermetic environments (this image does not ship wandb).
"""
from __future__ import annotations

from typing import Optional

from efficient_attention_tpu.training.offline_jsonl import OfflineJsonlWriter


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
            self._file = OfflineJsonlWriter(
                log_dir, "wandb_offline", "run.jsonl",
                header={"project": project, "name": run_name,
                        "config": config or {}})

    def log(self, metrics: dict, step: int) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        elif self._file is not None:
            self._file.log(metrics, step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        elif self._file is not None:
            self._file.close()
            self._file = None
