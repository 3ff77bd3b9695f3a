"""Structured metrics logging: JSONL always, TensorBoard optionally.

The reference logs through a TensorFlow FileWriter wrapper
(reference: logger.py:Logger — scalar/image/histogram summaries) plus
stdout prints. Here the primary sink is append-only JSONL (machine-
readable, crash-safe); TensorBoard is an optional secondary sink gated on
the ``tensorflow`` import so the framework has no hard TF dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np


class JSONLLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._fh = open(path, "a", buffering=1)

    def log(self, record: dict[str, Any]) -> None:
        rec = {"ts": round(time.time(), 3)}
        for k, v in record.items():
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    __call__ = log

    def close(self):
        self._fh.close()


class TensorBoardLogger:
    """Optional TB sink (scalar/image/histogram — logger.py:Logger parity).

    No-ops cleanly when tensorflow is unavailable.
    """

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=step)

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: (H, W, C) float [0,1] or uint8."""
        if self._writer is None:
            return
        if img.dtype != np.uint8:
            img = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        with self._writer.as_default():
            self._tf.summary.image(tag, img[None], step=step)

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.histogram(tag, np.asarray(values), step=step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
