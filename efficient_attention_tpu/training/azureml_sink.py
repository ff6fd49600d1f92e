"""AzureML metrics sink (``fairseq/logging/progress_bar.py:101-130`` parity).

The reference's ``AzureMLProgressBarWrapper`` logs scalars through
``azureml.core.Run.get_context().log_row``.  Here: use the real azureml SDK
when installed; otherwise degrade to the shared offline JSON-lines writer
(``<dir>/azureml_offline/metrics.jsonl``) with the same ``log(dict, step)``
surface, so recipes passing ``--azureml-logging`` keep working in hermetic
environments (this image does not ship azureml).
"""
from __future__ import annotations

from efficient_attention_tpu.training.offline_jsonl import OfflineJsonlWriter


class AzureMLLogger:
    def __init__(self, enabled: bool, log_dir: str = "."):
        self._run = None
        self._file = None
        if not enabled:
            return
        try:
            from azureml.core import Run  # type: ignore

            self._run = Run.get_context()
        except ImportError:
            self._file = OfflineJsonlWriter(log_dir, "azureml_offline",
                                            "metrics.jsonl")

    def log(self, metrics: dict, step: int) -> None:
        if self._run is not None:
            for k, v in metrics.items():
                self._run.log_row(k, step=int(step), value=float(v))
        elif self._file is not None:
            self._file.log(metrics, step)

    def finish(self) -> None:
        if self._run is not None and hasattr(self._run, "flush"):
            self._run.flush()
        if self._file is not None:
            self._file.close()
            self._file = None
