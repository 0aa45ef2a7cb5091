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
        # The program returns per-row [B] increments (B == 1 here).
        self._sum += float(s[0])
        self._sumsq += float(ss[0])
        self._count += float(n[0])
        return np.asarray(wav_out[0])


class BatchedStreamingEnhancer:
    """Multi-stream serving engine: up to `max_streams` concurrent live
    streams enhanced in ONE jitted program per tick.

    TPU-first serving: a single stream's 1 s chunk leaves the MXU idle, so a
    serving process batches every live session's next block into one
    [max_streams, window] program (compiled once — idle slots ride along as
    zero-length rows whose outputs and stats increments are discarded).
    Per-slot state (input buffer, left-context history, running normalization
    moments) is exactly StreamingEnhancer's, so each stream's audio matches
    the single-stream engine (tests/test_batched_streaming.py); the running
    moments are per-row in the program itself (enhance.py streaming fn).

    Session API:
      slot = eng.open()            # -> slot id, RuntimeError when full
      eng.feed(slot, samples)      # buffer capture audio (no compute)
      eng.end_stream(slot)         # no more input; final partial chunk flushes
      eng.step() -> {slot: samples}  # ONE batched program over ready slots
      eng.close(slot)              # free the slot for a new session
    Call step() until it returns {} to drain (each call advances every ready
    stream by one chunk).  Throughput/latency: scripts/serving_bench.py.
    """

    def __init__(self, cfg: Config, params, max_streams: int = 8,
                 chunk_seconds: float = 1.0, lookahead_seconds: float = 0.2,
                 history_seconds: float = 1.0):
        self.cfg = cfg
        self.params = params
        self.max_streams = max_streams
        sr = cfg.audio.sample_rate
        self.chunk = int(chunk_seconds * sr)
        self.lookahead = int(lookahead_seconds * sr)
        self.history = int(history_seconds * sr)
        self._window = self.history + self.chunk + self.lookahead
        self._fn = make_streaming_enhance_fn(cfg)
        self._slots: list[dict | None] = [None] * max_streams

    def open(self) -> int:
        for s in range(self.max_streams):
            if self._slots[s] is None:
                self._slots[s] = {
                    "buf": np.zeros(0, np.float32),
                    "hist": np.zeros(self.history, np.float32),
                    "sum": 0.0, "sumsq": 0.0, "count": 0.0,
                    "flush": False, "done": False,
                }
                return s
        raise RuntimeError(f"all {self.max_streams} stream slots in use")

    def close(self, slot: int) -> None:
        self._slots[slot] = None

    def is_done(self, slot: int) -> bool:
        """True once an ended stream's final flush has been emitted."""
        st = self._slots[slot]
        return st is not None and st["done"]

    def feed(self, slot: int, samples: np.ndarray) -> None:
        st = self._slots[slot]
        if st is None or st["flush"]:
            raise RuntimeError(f"slot {slot} is not an open stream")
        st["buf"] = np.concatenate([st["buf"], samples.astype(np.float32)])

    def end_stream(self, slot: int) -> None:
        st = self._slots[slot]
        if st is None:
            raise RuntimeError(f"slot {slot} is not an open stream")
        st["flush"] = True

    def step(self) -> dict[int, np.ndarray]:
        """Run one batched tick; returns {slot: enhanced samples} for every
        slot that had a full chunk buffered (or a final flush pending)."""
        jobs: list[tuple[int, str]] = []
        for s, st in enumerate(self._slots):
            if st is None or st["done"]:
                continue
            if len(st["buf"]) >= self.chunk + self.lookahead:
                jobs.append((s, "feed"))
            elif st["flush"] and len(st["buf"]):
                jobs.append((s, "flush"))
            elif st["flush"]:
                st["done"] = True
        if not jobs:
            return {}

        hop = self.cfg.audio.hop_length
        b = self.max_streams
        block = np.zeros((b, self._window), np.float32)
        lengths = np.zeros(b, np.int32)
        ss = np.zeros(b, np.int32)
        se = np.zeros(b, np.int32)
        run = np.zeros((3, b), np.float32)
        n_new = {}
        for s, mode in jobs:
            st = self._slots[s]
            new = (st["buf"][: self.chunk + self.lookahead]
                   if mode == "feed" else st["buf"])
            consumed = self.chunk if mode == "feed" else len(new)
            block[s, : self.history] = st["hist"]
            block[s, self.history: self.history + len(new)] = new
            lengths[s] = self.history + len(new)
            # Same stats-window contract as StreamingEnhancer._run: the
            # increment covers exactly the samples this tick consumes.
            ss[s] = self.history // hop
            se[s] = (self.history + consumed) // hop
            run[:, s] = st["sum"], st["sumsq"], st["count"]
            n_new[s] = len(new)
        # Idle rows: length 0, ss == se == 0 -> zero stats increment, output
        # discarded.  One fixed [max_streams, window] shape = one compile.
        wav_out, b_sum, b_sumsq, b_count = self._fn(
            self.params, jnp.asarray(block), jnp.asarray(lengths),
            jnp.asarray(ss), jnp.asarray(se),
            jnp.asarray(run[0]), jnp.asarray(run[1]), jnp.asarray(run[2]))
        wav_out = np.asarray(wav_out)
        b_sum, b_sumsq, b_count = (np.asarray(b_sum), np.asarray(b_sumsq),
                                   np.asarray(b_count))

        out: dict[int, np.ndarray] = {}
        for s, mode in jobs:
            st = self._slots[s]
            st["sum"] += float(b_sum[s])
            st["sumsq"] += float(b_sumsq[s])
            st["count"] += float(b_count[s])
            if mode == "feed":
                out[s] = wav_out[s, self.history: self.history + self.chunk]
                consumed_samples = st["buf"][: self.chunk]
                st["buf"] = st["buf"][self.chunk:]
            else:
                out[s] = wav_out[s, self.history: self.history + n_new[s]]
                consumed_samples = st["buf"]
                st["buf"] = np.zeros(0, np.float32)
                st["done"] = True
            if self.history:
                st["hist"] = np.concatenate(
                    [st["hist"], consumed_samples])[-self.history:]
        return out


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
