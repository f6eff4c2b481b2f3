"""Metrics logging: tensorboard (tensorboardX) + JSONL, wandb optional.

Replaces the reference's WandbLogger/TensorBoardLogger selection
(reference: src/train_diffsep.py:141-154).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    """Writes scalars to a JSONL file and, when available, tensorboard.
    Set backend='wandb' to use wandb (gated on the optional package)."""

    def __init__(self, workdir: str, backend: str = "tensorboard",
                 project: Optional[str] = None):
        self.dir = Path(workdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        self._wandb = None
        if backend == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(str(self.dir / "tb"))
            except ImportError:
                pass
        elif backend == "wandb":
            try:
                import wandb
                self._wandb = wandb.init(project=project or "ditsep_tpu",
                                         dir=str(self.dir))
            except ImportError:
                pass

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
