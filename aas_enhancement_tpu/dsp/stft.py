"""STFT / ISTFT and log-magnitude featurization, pure JAX.

TPU-native replacement for the reference's librosa/scipy STFT pipeline
(SURVEY.md §2 "STFT featurizer", "ISTFT / overlap-add reconstruction"):

- wav -> framed, windowed, rFFT -> magnitude -> log1p spectrogram, optionally
  per-utterance normalized (reference parity: deepspeech-style log1p + mean/std norm).
- ISTFT: enhanced magnitude recombined with the NOISY phase, inverse rFFT per frame,
  windowed overlap-add with window-square COLA normalization (BASELINE.json:5
  "ISTFT overlap-add reconstruction ... using the noisy phase").

Everything here is jittable with static shapes; batch versions operate on padded
[B, num_samples] with length masks.  A fused Pallas matmul-DFT implementation lives in
ops/pallas/stft_kernel.py behind the same API (SURVEY.md §7 step 1/8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def get_window(name: str, n: int) -> np.ndarray:
    """Periodic window (matches librosa/scipy sym=False) as float32 numpy."""
    if name == "hann":
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)
    if name == "hamming":
        return (0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)
    raise ValueError(f"unknown window: {name!r}")


def num_frames(num_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Static frame count for a given signal length."""
    if center:
        return 1 + num_samples // hop_length
    return 1 + (num_samples - n_fft) // hop_length


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True) -> jnp.ndarray:
    """[..., num_samples] -> [..., T, n_fft] frames (reflect-padded when center=True)."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    n = x.shape[-1]
    t = 1 + (n - n_fft) // hop_length
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window", "center"))
def stft(x: jnp.ndarray, n_fft: int, hop_length: int, window: str = "hann",
         center: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT. [..., num_samples] -> (real, imag) each [..., T, n_fft//2+1]."""
    win = jnp.asarray(get_window(window, n_fft))
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop_length, center) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)


def magnitude(re: jnp.ndarray, im: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.sqrt(re * re + im * im + eps)


def phase(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(im, re)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window", "center",
                                             "length"))
def istft(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop_length: int,
          window: str = "hann", center: bool = True, length: int | None = None) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with COLA normalization.

    (re, im): [..., T, n_fft//2+1] -> [..., num_samples].
    """
    win = jnp.asarray(get_window(window, n_fft))
    frames = jnp.fft.irfft(jax.lax.complex(re, im), n=n_fft, axis=-1) * win

    t = frames.shape[-2]
    out_len = n_fft + (t - 1) * hop_length
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, t, n_fft))

    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]  # [T, n_fft]
    idx_flat = jnp.asarray(idx.reshape(-1))

    def ola(fr):  # [T, n_fft] -> [out_len]
        return jnp.zeros((out_len,), jnp.float32).at[idx_flat].add(fr.reshape(-1))

    y = jax.vmap(ola)(flat)

    # COLA window-square normalization.
    wsq = jnp.zeros((out_len,), jnp.float32).at[idx_flat].add(
        jnp.tile(win * win, (t,)))
    y = y / jnp.maximum(wsq, 1e-8)
    y = y.reshape(batch_shape + (out_len,))

    if center:
        y = y[..., n_fft // 2:]
        if length is not None:
            y = y[..., :length]
    elif length is not None:
        y = y[..., :length]
    return y


# ---------------------------------------------------------------------------
# Featurization (reference SpectrogramParser.parse_audio equivalent)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window", "center",
                                             "normalize"))
def log_magnitude_features(x: jnp.ndarray, n_fft: int, hop_length: int,
                           window: str = "hann", center: bool = True,
                           normalize: bool = True
                           ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """wav [..., n] -> (log1p-mag [..., T, F], mag [..., T, F], phase [..., T, F]).

    Reference parity: deepspeech-style `log1p(|STFT|)` with optional per-utterance
    mean/std normalization (SURVEY.md §2 "STFT featurizer").
    """
    re, im = stft(x, n_fft, hop_length, window, center)
    mag = magnitude(re, im)
    ph = phase(re, im)
    log_mag = jnp.log1p(mag)
    if normalize:
        mean = jnp.mean(log_mag, axis=(-2, -1), keepdims=True)
        std = jnp.std(log_mag, axis=(-2, -1), keepdims=True)
        log_mag = (log_mag - mean) / (std + 1e-5)
    return log_mag, mag, ph


def reconstruct(mag: jnp.ndarray, ph: jnp.ndarray, n_fft: int, hop_length: int,
                window: str = "hann", center: bool = True,
                length: int | None = None) -> jnp.ndarray:
    """Enhanced magnitude + (noisy) phase -> waveform (SURVEY.md §3.3 enhance path)."""
    re = mag * jnp.cos(ph)
    im = mag * jnp.sin(ph)
    return istft(re, im, n_fft, hop_length, window, center, length)
