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
    """
    a = cfg.audio
    model = Enhancer(cfg.enhancer)

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
        enhanced_mag = apply_enhancement(cfg.enhancer, out, mag)
        return dsp_api.reconstruct(a, enhanced_mag, ph, length=wav.shape[-1])

    return enhance


def enhance_utterance(cfg: Config, params, wav: np.ndarray) -> np.ndarray:
    """Single-utterance convenience wrapper (driver config 1, BASELINE.json:7)."""
    fn = make_enhance_fn(cfg)
    n = len(wav)
    out = fn(params, jnp.asarray(wav)[None, :], jnp.array([n], jnp.int32))
    return np.asarray(out[0])
