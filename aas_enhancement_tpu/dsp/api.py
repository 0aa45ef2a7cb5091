"""STFT/ISTFT dispatcher: pure-JAX vs fused Pallas behind one call site.

AudioConfig.stft_impl selects: "jax" (always works), "pallas" (requires
n_fft == 2*hop and a TPU backend), or "auto" (pallas on TPU when eligible).
"""

from __future__ import annotations

import jax

from aas_enhancement_tpu.config import AudioConfig
from aas_enhancement_tpu.dsp.stft import istft as _istft_jax, stft as _stft_jax
from aas_enhancement_tpu.ops.pallas import stft_kernel as _pallas_impl


def _use_pallas(a: AudioConfig) -> bool:
    impl = getattr(a, "stft_impl", "auto")
    if impl == "jax":
        return False
    eligible = a.n_fft == 2 * a.hop_length
    if impl == "pallas":
        if not eligible:
            raise ValueError("stft_impl=pallas requires n_fft == 2*hop_length")
        return True
    # auto: fused kernels on TPU only (interpret-mode Pallas on CPU is slow).
    # The axon tunnel registers the TPU backend under its own platform name, so
    # check the device kind rather than the backend string.
    if not eligible:
        return False
    dev = jax.devices()[0]
    return "tpu" in (dev.platform + " " + getattr(dev, "device_kind", "")).lower()


def stft(a: AudioConfig, x):
    if _use_pallas(a):
        return _pallas_impl.stft_pallas(x, a.n_fft, a.hop_length, a.window, a.center)
    return _stft_jax(x, a.n_fft, a.hop_length, a.window, a.center)


def istft(a: AudioConfig, re, im, length=None):
    if _use_pallas(a):
        return _pallas_impl.istft_pallas(re, im, a.n_fft, a.hop_length, a.window,
                                         a.center, length)
    return _istft_jax(re, im, a.n_fft, a.hop_length, a.window, a.center, length)


def reconstruct(a: AudioConfig, mag, ph, length=None):
    import jax.numpy as jnp
    return istft(a, mag * jnp.cos(ph), mag * jnp.sin(ph), length)
