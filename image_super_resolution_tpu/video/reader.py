"""Streaming video frame source.

The reference wraps torchvision.io.VideoReader in a Dataset whose
``__getitem__`` ignores the index and returns the next frame
(utils/datasets.py:431-463 — sequential regardless of sampler). Here a plain
generator yields fixed-size RGB uint8 batches for the jitted SR step: fixed
batch shapes mean ONE compiled program for the whole stream; the tail batch is
padded and trimmed after inference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Tuple

import numpy as np


class VideoSource:
    """cv2-backed sequential frame reader with metadata."""

    def __init__(self, src: str | Path):
        import cv2

        self._cap = cv2.VideoCapture(str(src))
        if not self._cap.isOpened():
            raise IOError(f"cannot open video: {src}")
        self.fps = self._cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.total_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def frames(self) -> Iterator[np.ndarray]:
        """Yield RGB uint8 HWC frames."""
        while True:
            ok, frame = self._cap.read()
            if not ok:
                break
            yield frame[..., ::-1]  # BGR -> RGB

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (RGB uint8 NHWC batch, n_valid) with a FIXED batch size —
        the tail batch repeats its last frame so every step reuses the same
        compiled program."""
        buf = []
        for frame in self.frames():
            buf.append(frame)
            if len(buf) == batch_size:
                yield np.stack(buf), batch_size
                buf = []
        if buf:
            n_valid = len(buf)
            while len(buf) < batch_size:
                buf.append(buf[-1])
            yield np.stack(buf), n_valid

    def close(self) -> None:
        self._cap.release()
