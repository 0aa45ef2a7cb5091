"""Structured JSONL metrics (SURVEY.md §5 "Metrics/logging").

Reference: stdout prints + optional TensorBoard scalars.  Rebuild: append-only JSONL
with named north-star metrics (utts/sec/chip, RTF, WER — BASELINE.json:2) so the
bench harness and the training loop share one format.
"""

from __future__ import annotations

import json
import os
import sys
import time


class MetricsLogger:
    """JSONL metrics with optional TensorBoard mirroring (reference had stdout +
    TensorBoard/visdom scalars; tensorboard_dir activates tf.summary if TF is
    importable, and degrades silently otherwise)."""

    def __init__(self, path: str | None = None, echo: bool = True,
                 tensorboard_dir: str | None = None):
        self.path = path
        self.echo = echo
        self._f = None
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        if tensorboard_dir:
            try:
                import tensorflow as tf  # noqa: PLC0415
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except ImportError:
                print("tensorboard_dir given but tensorflow not importable; "
                      "JSONL only", file=sys.stderr)
        self._t0 = time.time()

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = round(float(v), 6)
            except (TypeError, ValueError):
                rec[k] = v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self.echo:
            print(line, file=sys.stderr)
        if self._tb is not None:
            import tensorflow as tf  # noqa: PLC0415
            with self._tb.as_default():
                for k, v in rec.items():
                    if k not in ("step", "t") and isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=int(step))

    def close(self) -> None:
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
