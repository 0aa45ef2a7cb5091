"""Chunked streaming enhancement.

The reference enhances offline, whole utterances at a time (SURVEY.md §3.3); the
north star additionally asks for sub-real-time STREAMING enhancement
(BASELINE.json:5).  TPU-first design:

- Audio is processed in fixed-size chunks (one XLA program, compiled once) with a
  lookahead tail: chunk t is enhanced using [chunk_t, chunk_{t+lookahead}] context,
  and only chunk_t's samples are emitted.  This is the standard block-bidirectional
  approximation — the BLSTM's backward direction sees `lookahead` seconds of future
  instead of the full utterance.
- Latency = chunk + lookahead seconds; throughput is the fused STFT->G->ISTFT
  program, thousands of times faster than real time on v5e, so RTF << 1 by a wide
  margin even at small chunks.
- Overlap-add on the waveform seam is unnecessary: ISTFT edge effects are confined
  to n_fft samples, covered by the lookahead margin.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.enhance import make_enhance_fn


class StreamingEnhancer:
    """Stateful chunk-wise enhancer: feed samples, receive enhanced samples.

    chunk_seconds of audio are emitted at a time, each enhanced with
    lookahead_seconds of future context (algorithmic latency = chunk + lookahead).
    """

    def __init__(self, cfg: Config, params, chunk_seconds: float = 1.0,
                 lookahead_seconds: float = 0.2):
        self.cfg = cfg
        self.params = params
        sr = cfg.audio.sample_rate
        self.chunk = int(chunk_seconds * sr)
        self.lookahead = int(lookahead_seconds * sr)
        self._fn = make_enhance_fn(cfg)
        self._buf = np.zeros(0, np.float32)
        self._window = self.chunk + self.lookahead

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Append input samples; returns whatever enhanced samples are ready."""
        self._buf = np.concatenate([self._buf, samples.astype(np.float32)])
        out = []
        while len(self._buf) >= self._window:
            block = self._buf[: self._window]
            enhanced = self._run(block)
            out.append(enhanced[: self.chunk])
            self._buf = self._buf[self.chunk:]
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """Enhance and return the remaining buffered samples."""
        if len(self._buf) == 0:
            return np.zeros(0, np.float32)
        n = len(self._buf)
        block = np.zeros(self._window, np.float32)
        block[:n] = self._buf
        self._buf = np.zeros(0, np.float32)
        # Only the n real samples are valid — the zero tail must not dilute the
        # per-utterance normalization statistics.
        return self._run(block, valid=n)[:n]

    def _run(self, block: np.ndarray, valid: int | None = None) -> np.ndarray:
        x = jnp.asarray(block)[None]
        lengths = jnp.array([valid if valid is not None else len(block)], jnp.int32)
        return np.asarray(self._fn(self.params, x, lengths)[0])


def enhance_stream(cfg: Config, params, samples: np.ndarray,
                   chunk_seconds: float = 1.0,
                   lookahead_seconds: float = 0.2,
                   feed_seconds: float = 0.1) -> Iterator[np.ndarray]:
    """Convenience generator: stream a full waveform through StreamingEnhancer in
    feed_seconds-sized pushes (simulating a live capture source)."""
    eng = StreamingEnhancer(cfg, params, chunk_seconds, lookahead_seconds)
    step = int(feed_seconds * cfg.audio.sample_rate)
    for i in range(0, len(samples), step):
        out = eng.feed(samples[i: i + step])
        if len(out):
            yield out
    tail = eng.flush()
    if len(tail):
        yield tail
