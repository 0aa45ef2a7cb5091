"""Chunked streaming enhancement.

The reference enhances offline, whole utterances at a time (SURVEY.md §3.3); the
north star additionally asks for sub-real-time STREAMING enhancement
(BASELINE.json:5).  TPU-first design:

- Audio is processed in fixed-size blocks (one XLA program, compiled once) of
  [history | chunk | lookahead]: chunk t is enhanced with `history` seconds of
  already-seen left context (so the BLSTM's FORWARD direction is warm, not reset
  at the chunk boundary) and `lookahead` seconds of future context (the standard
  block-bidirectional approximation for the backward direction).  Only chunk t's
  samples are emitted.
- Normalization parity: training normalizes log-magnitudes per full utterance;
  each block here is normalized with RUNNING moments carried across the stream
  (all frames seen so far, current block included), converging to the offline
  regime instead of re-normalizing every window from scratch.
- Latency = chunk + lookahead seconds (history adds compute, not latency);
  throughput is the fused STFT->G->ISTFT program, thousands of times faster than
  real time on v5e, so RTF << 1 by a wide margin even at small chunks.
- Overlap-add on the waveform seam is unnecessary: ISTFT edge effects are
  confined to n_fft samples, covered by the history/lookahead margins.
"""

from __future__ import annotations

from typing import Iterator

import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.enhance import make_streaming_enhance_fn


class StreamingEnhancer:
    """Stateful chunk-wise enhancer: feed samples, receive enhanced samples.

    chunk_seconds of audio are emitted at a time, each enhanced with
    history_seconds of past and lookahead_seconds of future context
    (algorithmic latency = chunk + lookahead; history is free context).
    """

    def __init__(self, cfg: Config, params, chunk_seconds: float = 1.0,
                 lookahead_seconds: float = 0.2, history_seconds: float = 1.0):
        self.cfg = cfg
        self.params = params
        sr = cfg.audio.sample_rate
        self.chunk = int(chunk_seconds * sr)
        self.lookahead = int(lookahead_seconds * sr)
        self.history = int(history_seconds * sr)
        self._fn = make_streaming_enhance_fn(cfg)
        self._buf = np.zeros(0, np.float32)
        # Left context: starts as synthetic silence (first block's history
        # frames are excluded from the running stats via stats_start).
        self._hist = np.zeros(self.history, np.float32)
        self._window = self.history + self.chunk + self.lookahead
        self._sum = 0.0
        self._sumsq = 0.0
        self._count = 0.0

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Append input samples; returns whatever enhanced samples are ready."""
        self._buf = np.concatenate([self._buf, samples.astype(np.float32)])
        out = []
        while len(self._buf) >= self.chunk + self.lookahead:
            enhanced = self._run(self._buf[: self.chunk + self.lookahead],
                                 consumed=self.chunk)
            out.append(enhanced[self.history: self.history + self.chunk])
            self._roll_history(self._buf[: self.chunk])
            self._buf = self._buf[self.chunk:]
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """Enhance and return the remaining buffered samples."""
        if len(self._buf) == 0:
            return np.zeros(0, np.float32)
        n = len(self._buf)
        enhanced = self._run(self._buf)
        self._roll_history(self._buf)
        self._buf = np.zeros(0, np.float32)
        return enhanced[self.history: self.history + n]

    # ------------------------------------------------------------- internals
    def _roll_history(self, consumed: np.ndarray) -> None:
        if self.history == 0:
            return
        self._hist = np.concatenate([self._hist, consumed])[-self.history:]

    def _run(self, new: np.ndarray, consumed: int | None = None) -> np.ndarray:
        hop = self.cfg.audio.hop_length
        block = np.zeros(self._window, np.float32)
        block[: self.history] = self._hist
        block[self.history: self.history + len(new)] = new
        valid = self.history + len(new)
        # The stats increment covers exactly the samples this call CONSUMES
        # (chunk in feed, everything in flush).  Frames before are history
        # (already in the running moments) or synthetic silence; frames after
        # are lookahead the NEXT block owns — counting them here would
        # double-count every chunk boundary.  Frame f covers samples starting
        # near f*hop (center padding shifts by n_fft//2, a sub-frame offset we
        # absorb here).
        consumed = len(new) if consumed is None else consumed
        stats_start = self.history // hop
        stats_end = (self.history + consumed) // hop
        wav_out, s, ss, n = self._fn(
            self.params, jnp.asarray(block)[None],
            jnp.array([valid], jnp.int32),
            jnp.asarray(stats_start, jnp.int32),
            jnp.asarray(stats_end, jnp.int32),
            jnp.asarray(self._sum, jnp.float32),
            jnp.asarray(self._sumsq, jnp.float32),
            jnp.asarray(self._count, jnp.float32))
        self._sum += float(s)
        self._sumsq += float(ss)
        self._count += float(n)
        return np.asarray(wav_out[0])


def enhance_stream(cfg: Config, params, samples: np.ndarray,
                   chunk_seconds: float = 1.0,
                   lookahead_seconds: float = 0.2,
                   history_seconds: float = 1.0,
                   feed_seconds: float = 0.1) -> Iterator[np.ndarray]:
    """Convenience generator: stream a full waveform through StreamingEnhancer in
    feed_seconds-sized pushes (simulating a live capture source)."""
    eng = StreamingEnhancer(cfg, params, chunk_seconds, lookahead_seconds,
                            history_seconds)
    step = int(feed_seconds * cfg.audio.sample_rate)
    for i in range(0, len(samples), step):
        out = eng.feed(samples[i: i + step])
        if len(out):
            yield out
    tail = eng.flush()
    if len(tail):
        yield tail
