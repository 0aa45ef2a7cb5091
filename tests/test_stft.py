"""STFT/ISTFT numerics (SURVEY.md §4 test pyramid, item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.dsp import (
    get_window, istft, log_magnitude_features, magnitude, num_frames, phase,
    reconstruct, stft,
)

N_FFT, HOP = 320, 160


def _signal(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 1337 * t)
         + 0.1 * rng.standard_normal(n))
    return x.astype(np.float32)


def test_stft_matches_numpy_oracle():
    """Framed-rfft oracle computed by hand in numpy (conventions-free check)."""
    x = _signal()
    re, im = stft(jnp.asarray(x), N_FFT, HOP, window="hann", center=False)
    win = get_window("hann", N_FFT)
    t = 1 + (len(x) - N_FFT) // HOP
    frames = np.stack([x[i * HOP: i * HOP + N_FFT] * win for i in range(t)])
    ref = np.fft.rfft(frames, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("window", ["hann", "hamming"])
@pytest.mark.parametrize("n", [16000, 16001, 8000])
def test_perfect_reconstruction(window, n):
    """ISTFT(STFT(x)) == x for COLA windows at 50% overlap (SURVEY.md §4.1)."""
    x = _signal(n)
    re, im = stft(jnp.asarray(x), N_FFT, HOP, window=window, center=True)
    y = istft(re, im, N_FFT, HOP, window=window, center=True, length=n)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_reconstruct_from_mag_phase():
    x = _signal()
    re, im = stft(jnp.asarray(x), N_FFT, HOP)
    mag, ph = magnitude(re, im), phase(re, im)
    y = reconstruct(mag, ph, N_FFT, HOP, length=len(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_batched_stft_matches_single():
    xs = np.stack([_signal(seed=i) for i in range(3)])
    re_b, im_b = stft(jnp.asarray(xs), N_FFT, HOP)
    for i in range(3):
        re_1, im_1 = stft(jnp.asarray(xs[i]), N_FFT, HOP)
        np.testing.assert_allclose(np.asarray(re_b[i]), np.asarray(re_1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(im_b[i]), np.asarray(im_1), atol=1e-5)


def test_feature_shapes_and_normalization():
    x = _signal()
    log_mag, mag, ph = log_magnitude_features(jnp.asarray(x), N_FFT, HOP, normalize=True)
    t = num_frames(len(x), N_FFT, HOP, center=True)
    assert log_mag.shape == (t, N_FFT // 2 + 1)
    assert mag.shape == ph.shape == log_mag.shape
    np.testing.assert_allclose(float(jnp.mean(log_mag)), 0.0, atol=1e-3)
    np.testing.assert_allclose(float(jnp.std(log_mag)), 1.0, atol=1e-2)


def test_num_frames_static():
    assert num_frames(16000, N_FFT, HOP, center=True) == 101
    assert num_frames(16000, N_FFT, HOP, center=False) == 99
