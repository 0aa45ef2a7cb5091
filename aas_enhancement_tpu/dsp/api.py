"""STFT/ISTFT dispatcher: XLA matmul-DFT vs Pallas kernels behind one call site.

AudioConfig.stft_impl selects: "jax"/"auto" (the segment matmul-DFT in
dsp/stft.py — the production path) or "pallas" (the fused kernels in
ops/pallas/stft_kernel.py; requires n_fft == 2*hop).

Round-2 profiling (BASELINE.md) moved the default OFF the Pallas kernels: the
plain-XLA segment matmul-DFT runs the same MXU math but fuses into the
surrounding jitted program (train step / enhance graph), while a pallas_call is
a fusion boundary with its own pipeline overhead — measured ~45x slower at the
bench shape (B=64 x 8 s).  The kernels remain available for comparison.
"""

from __future__ import annotations

from aas_enhancement_tpu.config import AudioConfig
from aas_enhancement_tpu.dsp.stft import istft as _istft_jax, stft as _stft_jax
from aas_enhancement_tpu.ops.pallas import stft_kernel as _pallas_impl


def _use_pallas(a: AudioConfig) -> bool:
    impl = getattr(a, "stft_impl", "auto")
    if impl == "pallas":
        if a.n_fft != 2 * a.hop_length:
            raise ValueError("stft_impl=pallas requires n_fft == 2*hop_length")
        return True
    return False


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
