"""Pallas fused STFT/ISTFT vs the pure-JAX reference implementation
(SURVEY.md §4 item 1; interpret mode on CPU, real kernels on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.dsp.stft import istft, stft
from aas_enhancement_tpu.ops.pallas.stft_kernel import istft_pallas, stft_pallas

N_FFT, HOP = 320, 160


def _signal(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.4 * np.sin(2 * np.pi * 523 * t)
            + 0.2 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("n", [16000, 16001, 40000])
@pytest.mark.parametrize("center", [True, False])
def test_stft_matches_jax(n, center):
    x = jnp.asarray(_signal(n))
    re_p, im_p = stft_pallas(x, N_FFT, HOP, center=center, interpret=True)
    re_j, im_j = stft(x, N_FFT, HOP, center=center)
    assert re_p.shape == re_j.shape
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_j), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_j), atol=2e-3)


def test_stft_batched():
    xs = jnp.asarray(np.stack([_signal(16000, i) for i in range(3)]))
    re_p, im_p = stft_pallas(xs, N_FFT, HOP, interpret=True)
    re_j, im_j = stft(xs, N_FFT, HOP)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_j), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_j), atol=2e-3)


@pytest.mark.parametrize("n", [16000, 40000])
def test_istft_roundtrip(n):
    """istft_pallas(stft(x)) == x (perfect reconstruction through the kernel)."""
    x = _signal(n)
    re, im = stft(jnp.asarray(x), N_FFT, HOP, center=True)
    y = istft_pallas(re, im, N_FFT, HOP, center=True, length=n, interpret=True)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_istft_matches_jax():
    rng = np.random.default_rng(5)
    t, f = 101, N_FFT // 2 + 1
    re = jnp.asarray(rng.standard_normal((2, t, f)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((2, t, f)).astype(np.float32))
    y_p = istft_pallas(re, im, N_FFT, HOP, center=True, length=16000, interpret=True)
    y_j = istft(re, im, N_FFT, HOP, center=True, length=16000)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_j), atol=2e-3)


def test_istft_default_length_matches_jax():
    """center=True, length=None must give identical shapes on both paths."""
    rng = np.random.default_rng(8)
    re = jnp.asarray(rng.standard_normal((1, 101, N_FFT // 2 + 1)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((1, 101, N_FFT // 2 + 1)).astype(np.float32))
    y_j = istft(re, im, N_FFT, HOP, center=True)
    y_p = istft_pallas(re, im, N_FFT, HOP, center=True, interpret=True)
    assert y_p.shape == y_j.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_j), atol=2e-3)
