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
    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
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

    def close(self) -> None:
        if self._f:
            self._f.close()
