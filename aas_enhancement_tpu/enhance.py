"""The enhancement inference path: wav -> STFT -> enhancer -> ISTFT -> wav.

Reference parity: the `enhance` entry point (SURVEY.md §3.3) — read wavs, enhance the
magnitude, reconstruct with the NOISY phase, write wavs.  This is the RTF metric path
(BASELINE.json:2).  TPU-first: the whole chain is ONE jitted program per padded input
shape (BASELINE.json:5 "Inference-mode enhancement (STFT -> network -> ISTFT) is fused
end-to-end"), so XLA fuses featurization, the network, and reconstruction with no
host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.dsp import api as dsp_api
from aas_enhancement_tpu.dsp.stft import magnitude, phase
from aas_enhancement_tpu.models.enhancer import Enhancer, apply_enhancement
from aas_enhancement_tpu.ops.masking import masked_normalize


def init_enhancer(cfg: Config, rng: jax.Array, max_t: int = 128):
    """Initialize enhancer params for any input length (shapes are length-agnostic)."""
    model = Enhancer(cfg.enhancer)
    x = jnp.zeros((1, max_t, cfg.audio.num_bins), jnp.float32)
    lengths = jnp.array([max_t], jnp.int32)
    return model.init(rng, x, lengths)


def make_enhance_fn(cfg: Config):
    """Returns jitted fn(params, wav [B, n], lengths [B]) -> enhanced wav [B, n].

    One XLA program: framing + window + rFFT + normalization + conv/BLSTM + mask/map +
    inverse rFFT + overlap-add.  Static per (B, n) bucket shape.

    Memoized on (audio, enhancer) config so repeated construction (one
    StreamingEnhancer or enhance_utterance call per utterance) reuses the same
    jitted closure instead of recompiling.
    """
    return _make_enhance_fn(cfg.audio, cfg.enhancer)


@functools.lru_cache(maxsize=32)
def _make_enhance_fn(audio_cfg, enhancer_cfg):
    a = audio_cfg
    model = Enhancer(enhancer_cfg)
    enh_cfg = enhancer_cfg

    @functools.partial(jax.jit, static_argnames=())
    def enhance(params, wav: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        re, im = dsp_api.stft(a, wav)
        mag = magnitude(re, im)
        ph = phase(re, im)
        log_mag = jnp.log1p(mag)
        frame_lengths = 1 + lengths // a.hop_length if a.center else (
            1 + (lengths - a.n_fft) // a.hop_length)
        if a.normalize:
            net_in = masked_normalize(log_mag, frame_lengths)
        else:
            net_in = log_mag
        out = model.apply(params, net_in, frame_lengths)
        enhanced_mag = apply_enhancement(enh_cfg, out, mag)
        return dsp_api.reconstruct(a, enhanced_mag, ph, length=wav.shape[-1])

    return enhance


def make_streaming_enhance_fn(cfg: Config):
    """Streaming variant of make_enhance_fn with RUNNING normalization stats.

    Training/offline inference normalizes log-magnitudes with per-UTTERANCE
    mean/std (ops/masking.masked_normalize); a streamed chunk cannot see the
    whole utterance, so the host carries running scalar moments across blocks
    and this program normalizes with (running + current block) statistics —
    converging to the offline regime as the stream progresses instead of
    re-normalizing every window from scratch.

    fn(params, wav [B, n], lengths [B], stats_start, stats_end, run_sum,
       run_sumsq, run_count) -> (enhanced [B, n], block_sum [B],
       block_sumsq [B], block_count [B])

    Every row is an INDEPENDENT stream: stats_start/stats_end and the running
    moments accept per-row [B] vectors (scalars broadcast), and the returned
    increments are per-row — this is what lets BatchedStreamingEnhancer
    (streaming.py) serve many concurrent live streams in one program.

    stats_start / stats_end: the frame window whose statistics this block
    CONTRIBUTES to the running moments.  Frames before stats_start are
    history already folded in (or synthetic leading silence on the first
    block); frames at/after stats_end are lookahead that the NEXT block will
    own (counting them here would double-count every chunk boundary).  The
    full block (history+chunk+lookahead) still participates in this block's
    normalization via the combined running+block moments; only the increment
    handed back to the host is windowed.

    Memoized on (audio, enhancer) config — see make_enhance_fn.
    """
    return _make_streaming_enhance_fn(cfg.audio, cfg.enhancer)


@functools.lru_cache(maxsize=32)
def _make_streaming_enhance_fn(audio_cfg, enhancer_cfg):
    from aas_enhancement_tpu.ops.masking import time_mask

    a = audio_cfg
    model = Enhancer(enhancer_cfg)

    @jax.jit
    def enhance(params, wav, lengths, stats_start, stats_end,
                run_sum, run_sumsq, run_count):
        re, im = dsp_api.stft(a, wav)
        mag = magnitude(re, im)
        ph = phase(re, im)
        log_mag = jnp.log1p(mag)
        frame_lengths = 1 + lengths // a.hop_length if a.center else (
            1 + (lengths - a.n_fft) // a.hop_length)
        t_max = log_mag.shape[1]
        n_bins = log_mag.shape[2]

        valid = time_mask(frame_lengths, t_max)            # [B, T]
        t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]
        # Scalars reshape to [1, 1] / [1] and broadcast; [B] vectors address
        # each row's own stats window and running moments.
        ss = jnp.reshape(jnp.asarray(stats_start, jnp.int32), (-1, 1))
        se = jnp.reshape(jnp.asarray(stats_end, jnp.int32), (-1, 1))
        new = valid * (t_idx >= ss) * (t_idx < se)
        new_f = new[:, :, None]
        b_sum = jnp.sum(log_mag * new_f, axis=(1, 2))          # [B]
        b_sumsq = jnp.sum((log_mag ** 2) * new_f, axis=(1, 2))
        b_count = jnp.sum(new, axis=1) * n_bins                # [B]

        tot = jnp.maximum(run_count + b_count, 1.0)            # [B]
        mean = (run_sum + b_sum) / tot
        var = jnp.maximum((run_sumsq + b_sumsq) / tot - mean ** 2, 0.0)
        if a.normalize:
            net_in = ((log_mag - mean[:, None, None])
                      / jnp.sqrt(var[:, None, None] + 1e-5)) * valid[:, :, None]
        else:
            net_in = log_mag
        out = model.apply(params, net_in, frame_lengths)
        enhanced_mag = apply_enhancement(enhancer_cfg, out, mag)
        wav_out = dsp_api.reconstruct(a, enhanced_mag, ph, length=wav.shape[-1])
        return wav_out, b_sum, b_sumsq, b_count

    return enhance


def enhance_utterance(cfg: Config, params, wav: np.ndarray) -> np.ndarray:
    """Single-utterance convenience wrapper (driver config 1, BASELINE.json:7)."""
    fn = make_enhance_fn(cfg)
    n = len(wav)
    out = fn(params, jnp.asarray(wav)[None, :], jnp.array([n], jnp.int32))
    return np.asarray(out[0])
