"""Metric logging: JSONL scalars + periodic stylized-image dumps.

Replaces the reference's tensorboardX scalar writer (train.py:86,196-198)
with a dependency-free JSONL stream (one line per logged step) under
``<output>/logs/metrics.jsonl``, plus the same per-iteration console line
and ``<output>/test/<iteration>/`` image dumps (train.py:200-219)."""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from ..data.transforms import to_image

# absl/jax may have configured the root logger already (making basicConfig
# a no-op at WARNING level); configure our logger explicitly instead.
logger = logging.getLogger("rpst")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False


class MetricWriter:
    """JSONL scalars (machine-readable) + TensorBoard event files when
    available — per-loss-key scalars matching the reference's
    tensorboardX usage (``writer.add_scalar``, train.py:86,196-198)."""

    def __init__(self, output_dir, tensorboard: bool = True):
        self.log_dir = Path(output_dir) / "logs"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.log_dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:  # torch/tensorboard not present: JSONL only
                self._tb = None

    def write(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def save_image_row(images, path, clip=True):
    """Horizontally concatenated image panel (the reference's 3-panel
    ``{content}-{style}-cat.png``, train.py:208-218)."""
    arrs = [np.clip(np.asarray(im, np.float32), 0, 1) for im in images]
    row = np.concatenate(arrs, axis=1)
    to_image(row).save(path)


def save_image(image, path):
    to_image(image).save(path)
