"""Metrics logging: JSONL always, TensorBoard when available.

The reference logs per-step scalars and image grids to TensorBoard only
(train.py:65, 108-125, 250-256 — tags ``loss``, ``loss/content``,
``loss/adv``, ``loss/dis``, ``images/hr``, ``images/lr``). Those tags are
preserved; a machine-readable JSONL stream is added since TensorBoard may be
absent in hermetic environments.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict

import numpy as np


class MetricsLogger:
    def __init__(
        self,
        work_dir: str | Path,
        run_name: str = "run",
        use_tensorboard: bool = True,
        enabled: bool = True,
    ):
        """``enabled=False`` makes every method a no-op — multi-host training
        passes ``jax.process_index() == 0`` so only one process writes the
        JSONL/TensorBoard streams (all hosts hold identical replicated
        metrics; concurrent writers would corrupt the files)."""
        self.enabled = bool(enabled)
        self.work_dir = Path(work_dir)
        self._jsonl = None
        self._tb = None
        if not self.enabled:
            return
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.work_dir / f"{run_name}_metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    self.work_dir.as_posix(), comment=run_name, flush_secs=30,
                    max_queue=200,
                )
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._jsonl is None:
            return
        self._jsonl.write(
            json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": int(step)})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, metrics: Dict[str, Any], step: int) -> None:
        for tag, value in metrics.items():
            self.scalar(tag, float(np.asarray(value)), step)

    def images(self, tag: str, batch_u8: np.ndarray, step: int) -> None:
        """Log an NHWC uint8 image batch (reference dumps the first 10
        batches of hr/lr as a visual pipeline check, train.py:250-256)."""
        if self._tb is not None:
            self._tb.add_images(tag, np.asarray(batch_u8), step, dataformats="NHWC")

    def flush(self) -> None:
        if self._jsonl is None:
            return
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
