"""Block-streaming recognition: live audio -> (enhancer ->) AM -> greedy CTC.

The reference recognizes offline only (SURVEY.md §3.3 evaluate path); the
serving story here extends the block-bidirectional streaming approximation
(streaming.py) from enhancement to RECOGNITION: each [history | chunk |
lookahead] window runs ONE jitted program — STFT, optional enhancer, the
DeepSpeech2 AM — and exactly the chunk's acoustic-model frames are emitted,
so the stitched frame sequence covers the utterance with no gaps or overlaps
(tests/test_streaming_asr.py asserts frame-count equality with the offline
forward).  Incremental greedy CTC collapses across block boundaries; emitted
log-probs can be collected for a final beam+LM rescore of the streamed
session.

Normalization parity: offline evaluation normalizes the AM input (and, with
an enhancer, the enhancer input) per utterance; here BOTH normalizations use
running moments carried across blocks (the streaming.py scheme), converging
to the offline statistics as the stream progresses.

Frame accounting (audio.hop_length = hop, AM conv1 time stride = 2):
window-local input frame l is absolute frame P - H + l (P = frames consumed
so far, H = history frames), and AM frame j centers on input frame 2j, so
local AM frames [H/2, (H + C)/2) are exactly the chunk's absolute AM frames
[P/2, (P + C)/2).  This requires H and C (history and chunk in frames) to be
EVEN — chunk/history in whole tenths of a second satisfy it at the default
16 kHz / hop 160.  flush() always runs a final block (even with an empty
buffer) to emit the trailing ceil()/+1 frames the chunk stream never covers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.dsp import api as dsp_api
from aas_enhancement_tpu.dsp.stft import magnitude
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.enhancer import Enhancer, apply_enhancement
from aas_enhancement_tpu.ops.masking import time_mask


def make_streaming_asr_fn(cfg: Config, use_enhancer: bool):
    """-> jitted fn(am_params, g_params, wav [B, n], lengths [B],
    stats_start, stats_end, enh_run [3, B], am_run [3, B]) ->
    (logits [B, T_am, V], out_lengths [B], enh_inc [3, B], am_inc [3, B]).

    Running-moment contract matches enhance.py's streaming fn; the enhancer
    moments normalize the enhancer input, the AM moments normalize the AM
    input (log1p of the enhanced — or raw — magnitudes)."""
    return _make_streaming_asr_fn(cfg.audio, cfg.am, cfg.enhancer,
                                  use_enhancer)


def _window_stats(x, valid, ss, se):
    """Masked windowed moments of [B, T, F] x -> ([B] sum, sumsq, count)."""
    t_idx = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    new = valid * (t_idx >= ss) * (t_idx < se)
    new_f = new[:, :, None]
    return (jnp.sum(x * new_f, axis=(1, 2)),
            jnp.sum((x ** 2) * new_f, axis=(1, 2)),
            jnp.sum(new, axis=1) * x.shape[2])


def _running_normalize(x, valid, inc, run):
    """Normalize [B, T, F] x with running+block moments; -> (x_norm, inc)."""
    b_sum, b_sumsq, b_count = inc
    tot = jnp.maximum(run[2] + b_count, 1.0)
    mean = (run[0] + b_sum) / tot
    var = jnp.maximum((run[1] + b_sumsq) / tot - mean ** 2, 0.0)
    return ((x - mean[:, None, None])
            / jnp.sqrt(var[:, None, None] + 1e-5)) * valid[:, :, None]


@functools.lru_cache(maxsize=32)
def _make_streaming_asr_fn(audio_cfg, am_cfg, enhancer_cfg, use_enhancer):
    a = audio_cfg
    am = AcousticModel(am_cfg)
    enh = Enhancer(enhancer_cfg)

    @jax.jit
    def forward(am_params, g_params, wav, lengths, stats_start, stats_end,
                enh_run, am_run):
        re, im = dsp_api.stft(a, wav)
        mag = magnitude(re, im)
        log_mag = jnp.log1p(mag)
        frame_lengths = (1 + lengths // a.hop_length if a.center else
                         1 + (lengths - a.n_fft) // a.hop_length)
        valid = time_mask(frame_lengths, log_mag.shape[1])
        ss = jnp.reshape(jnp.asarray(stats_start, jnp.int32), (-1, 1))
        se = jnp.reshape(jnp.asarray(stats_end, jnp.int32), (-1, 1))

        if use_enhancer:
            enh_inc = _window_stats(log_mag, valid, ss, se)
            net_in = (_running_normalize(log_mag, valid, enh_inc, enh_run)
                      if a.normalize else log_mag)
            out = enh.apply(g_params, net_in, frame_lengths)
            am_log = jnp.log1p(apply_enhancement(enhancer_cfg, out, mag))
        else:
            enh_inc = (jnp.zeros_like(enh_run[0]),) * 3
            am_log = log_mag

        am_inc = _window_stats(am_log, valid, ss, se)
        am_in = _running_normalize(am_log, valid, am_inc, am_run)
        logits, out_lengths = am.apply(am_params, am_in, frame_lengths)
        return logits, out_lengths, jnp.stack(enh_inc), jnp.stack(am_inc)

    return forward


class StreamingRecognizer:
    """Stateful live recognizer: feed samples, read the growing transcript.

    With g_params, each block is enhanced before recognition — the full live
    AAS serving pipeline in one program per block.  `collect_logits=True`
    keeps the emitted frames' log-probs so the finished session can be
    re-decoded with beam+LM (decode.beam.beam_decode on `logits()`)."""

    def __init__(self, cfg: Config, am_params, g_params=None,
                 chunk_seconds: float = 1.0, lookahead_seconds: float = 0.2,
                 history_seconds: float = 1.0, collect_logits: bool = False):
        self.cfg = cfg
        self.am_params = am_params
        self.g_params = g_params if g_params is not None else {}
        sr = cfg.audio.sample_rate
        hop = cfg.audio.hop_length
        self.chunk = int(chunk_seconds * sr)
        self.lookahead = int(lookahead_seconds * sr)
        self.history = int(history_seconds * sr)
        for name, n in (("chunk", self.chunk), ("history", self.history)):
            if n % hop or (n // hop) % 2:
                raise ValueError(
                    f"{name} ({n} samples) must be a whole, EVEN number of "
                    f"hops (hop_length={hop}) for exact AM frame stitching")
        self._window = self.history + self.chunk + self.lookahead
        self._fn = make_streaming_asr_fn(cfg, use_enhancer=g_params is not None)
        self._buf = np.zeros(0, np.float32)
        self._hist = np.zeros(self.history, np.float32)
        self._enh_run = np.zeros(3, np.float32)
        self._am_run = np.zeros(3, np.float32)
        self._ids: list[int] = []
        self._log_probs: list[np.ndarray] = [] if collect_logits else None
        self._flushed = False

    def feed(self, samples: np.ndarray) -> list[int]:
        """Append capture audio; returns the newly emitted argmax id frames."""
        self._buf = np.concatenate([self._buf, samples.astype(np.float32)])
        new: list[int] = []
        while len(self._buf) >= self.chunk + self.lookahead:
            new.extend(self._run(self._buf[: self.chunk + self.lookahead],
                                 consumed=self.chunk))
            self._hist = np.concatenate(
                [self._hist, self._buf[: self.chunk]])[-self.history:]
            self._buf = self._buf[self.chunk:]
        return new

    def flush(self) -> list[int]:
        """End of stream: emit the trailing frames (always runs one block)."""
        if self._flushed:
            return []
        self._flushed = True
        return self._run(self._buf, consumed=len(self._buf), final=True)

    def transcript(self) -> str:
        """Greedy CTC collapse of everything emitted so far."""
        return _collapse(self._ids)

    def log_probs(self) -> np.ndarray:
        """[T_emitted, V] log-probs of the streamed session (for beam+LM
        rescoring); requires collect_logits=True."""
        if self._log_probs is None:
            raise RuntimeError("constructed without collect_logits=True")
        return (np.concatenate(self._log_probs) if self._log_probs
                else np.zeros((0, 0), np.float32))

    # ------------------------------------------------------------- internals
    def _run(self, new: np.ndarray, consumed: int, final: bool = False):
        hop = self.cfg.audio.hop_length
        block = np.zeros(self._window, np.float32)
        block[: self.history] = self._hist
        block[self.history: self.history + len(new)] = new
        valid = self.history + len(new)
        ss = self.history // hop
        se = (self.history + consumed) // hop + (1 if final else 0)
        logits, out_lengths, enh_inc, am_inc = self._fn(
            self.am_params, self.g_params,
            jnp.asarray(block)[None], jnp.array([valid], jnp.int32),
            jnp.asarray(ss, jnp.int32), jnp.asarray(se, jnp.int32),
            jnp.asarray(self._enh_run[:, None]),
            jnp.asarray(self._am_run[:, None]))
        self._enh_run += np.asarray(enh_inc)[:, 0]
        self._am_run += np.asarray(am_inc)[:, 0]

        h_am = (self.history // hop) // 2
        if final:
            # Everything the window produced beyond the history frames.
            end = int(np.asarray(out_lengths)[0])
        else:
            end = (self.history // hop + consumed // hop) // 2
        frames = np.asarray(logits[0, h_am: end])
        if self._log_probs is not None:
            self._log_probs.append(np.asarray(
                jax.nn.log_softmax(jnp.asarray(frames), axis=-1), np.float32))
        ids = np.argmax(frames, axis=-1).astype(int).tolist()
        self._ids.extend(ids)
        return ids


def _collapse(ids) -> str:
    from aas_enhancement_tpu.labels import decode_ids

    collapsed, prev = [], 0
    for i in ids:
        if i != prev and i != 0:
            collapsed.append(i)
        prev = i
    return decode_ids(np.asarray(collapsed, np.int32))


class BatchedStreamingRecognizer:
    """Multi-session live recognition: up to `max_streams` concurrent
    sessions, ONE jitted (enhancer ->) AM program per tick.

    The serving counterpart of streaming.BatchedStreamingEnhancer for
    transcription — the block program (make_streaming_asr_fn) is per-row in
    its running moments, so every session keeps its own normalization state
    while sharing the batch.  Slot API mirrors the enhancer engine:
    open/feed/end_stream/step/close + transcript(slot); step() returns
    {slot: newly emitted argmax id frames}.  Per-session output matches
    StreamingRecognizer exactly (tests/test_streaming_asr.py)."""

    def __init__(self, cfg: Config, am_params, g_params=None,
                 max_streams: int = 8, chunk_seconds: float = 1.0,
                 lookahead_seconds: float = 0.5, history_seconds: float = 0.5):
        self.cfg = cfg
        self.am_params = am_params
        self.g_params = g_params if g_params is not None else {}
        self.max_streams = max_streams
        sr = cfg.audio.sample_rate
        hop = cfg.audio.hop_length
        self.chunk = int(chunk_seconds * sr)
        self.lookahead = int(lookahead_seconds * sr)
        self.history = int(history_seconds * sr)
        for name, n in (("chunk", self.chunk), ("history", self.history)):
            if n % hop or (n // hop) % 2:
                raise ValueError(
                    f"{name} ({n} samples) must be a whole, EVEN number of "
                    f"hops (hop_length={hop}) for exact AM frame stitching")
        self._window = self.history + self.chunk + self.lookahead
        self._fn = make_streaming_asr_fn(cfg, use_enhancer=g_params is not None)
        self._slots: list[dict | None] = [None] * max_streams

    def open(self) -> int:
        for s in range(self.max_streams):
            if self._slots[s] is None:
                self._slots[s] = {
                    "buf": np.zeros(0, np.float32),
                    "hist": np.zeros(self.history, np.float32),
                    "enh_run": np.zeros(3, np.float32),
                    "am_run": np.zeros(3, np.float32),
                    "ids": [], "flush": False, "done": False,
                }
                return s
        raise RuntimeError(f"all {self.max_streams} stream slots in use")

    def close(self, slot: int) -> None:
        self._slots[slot] = None

    def is_done(self, slot: int) -> bool:
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

    def transcript(self, slot: int) -> str:
        st = self._slots[slot]
        if st is None:
            raise RuntimeError(f"slot {slot} is not an open stream")
        return _collapse(st["ids"])

    def step(self) -> dict[int, list[int]]:
        """One batched tick; {slot: new argmax id frames} for ready slots.
        An ended stream ALWAYS takes a final block (even with an empty
        buffer) to emit the trailing frames — see the module docstring."""
        jobs: list[tuple[int, bool]] = []          # (slot, final)
        for s, st in enumerate(self._slots):
            if st is None or st["done"]:
                continue
            if len(st["buf"]) >= self.chunk + self.lookahead:
                jobs.append((s, False))
            elif st["flush"]:
                jobs.append((s, True))
        if not jobs:
            return {}

        hop = self.cfg.audio.hop_length
        b = self.max_streams
        block = np.zeros((b, self._window), np.float32)
        lengths = np.zeros(b, np.int32)
        ss = np.zeros(b, np.int32)
        se = np.zeros(b, np.int32)
        enh_run = np.zeros((3, b), np.float32)
        am_run = np.zeros((3, b), np.float32)
        for s, final in jobs:
            st = self._slots[s]
            new = st["buf"] if final else st["buf"][: self.chunk
                                                    + self.lookahead]
            consumed = len(new) if final else self.chunk
            block[s, : self.history] = st["hist"]
            block[s, self.history: self.history + len(new)] = new
            lengths[s] = self.history + len(new)
            ss[s] = self.history // hop
            se[s] = (self.history + consumed) // hop + (1 if final else 0)
            enh_run[:, s] = st["enh_run"]
            am_run[:, s] = st["am_run"]
        logits, out_lengths, enh_inc, am_inc = self._fn(
            self.am_params, self.g_params, jnp.asarray(block),
            jnp.asarray(lengths), jnp.asarray(ss), jnp.asarray(se),
            jnp.asarray(enh_run), jnp.asarray(am_run))
        logits = np.asarray(logits)
        out_lengths = np.asarray(out_lengths)
        enh_inc, am_inc = np.asarray(enh_inc), np.asarray(am_inc)

        h_am = (self.history // hop) // 2
        out: dict[int, list[int]] = {}
        for s, final in jobs:
            st = self._slots[s]
            st["enh_run"] += enh_inc[:, s]
            st["am_run"] += am_inc[:, s]
            if final:
                end = int(out_lengths[s])
                st["buf"] = np.zeros(0, np.float32)
                st["done"] = True
            else:
                end = (self.history // hop + self.chunk // hop) // 2
                st["hist"] = np.concatenate(
                    [st["hist"], st["buf"][: self.chunk]])[-self.history:]
                st["buf"] = st["buf"][self.chunk:]
            ids = np.argmax(logits[s, h_am: end], axis=-1).astype(int).tolist()
            st["ids"].extend(ids)
            out[s] = ids
        return out
