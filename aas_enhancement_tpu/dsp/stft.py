"""STFT / ISTFT and log-magnitude featurization, pure JAX.

TPU-native replacement for the reference's librosa/scipy STFT pipeline
(SURVEY.md §2 "STFT featurizer", "ISTFT / overlap-add reconstruction"):

- wav -> framed, windowed, rDFT -> magnitude -> log1p spectrogram, optionally
  per-utterance normalized (reference parity: deepspeech-style log1p + mean/std norm).
- ISTFT: enhanced magnitude recombined with the NOISY phase, inverse rDFT per frame,
  windowed overlap-add with window-square COLA normalization (BASELINE.json:5
  "ISTFT overlap-add reconstruction ... using the noisy phase").

TPU-first implementation notes (round-2 profiling, BASELINE.md):
- The transform is a MATMUL against DFT bases, not an FFT: at speech n_fft
  (~320) the MXU matmul beats jnp.fft's butterfly lowering by ~40x on TPU.
- When hop divides n_fft (the standard 50%-overlap config), framing is k = n_fft/hop
  hop-wide ROW SLICES of the reshaped signal — no [T, n_fft] gather — and the DFT
  is k window-folded segment matmuls summed.  Overlap-add is the mirror image:
  k static slice-adds, no scatter.  Everything is plain XLA, so it FUSES into the
  surrounding train/inference program (a pallas_call boundary cannot).
- When hop does not divide n_fft, the gather/scatter fallback below keeps the API
  total.

Everything here is jittable with static shapes; batch versions operate on padded
[B, num_samples] with length masks.  A fused Pallas matmul-DFT implementation lives in
ops/pallas/stft_kernel.py behind the same API (kept for comparison; the XLA path
above measures faster end-to-end because it fuses — see BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DOT_KW = dict(preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=8)
def _dft_bases_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases [n_fft, n_fft//2+1] (rfft convention: cos, -sin)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


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
    x = x.astype(jnp.float32)
    if n_fft % hop_length == 0:
        return _stft_segments(x, n_fft, hop_length, window, center)
    win = jnp.asarray(get_window(window, n_fft))
    frames = frame_signal(x, n_fft, hop_length, center) * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)


def _stft_segments(x: jnp.ndarray, n_fft: int, hop_length: int, window: str,
                   center: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free STFT for hop | n_fft: frame t spans rows t..t+k-1 of the
    hop-reshaped signal, so the windowed DFT is k segment matmuls summed —
    pure slices + MXU dots, fully fusable by XLA."""
    batch_shape = x.shape[:-1]          # () for 1-D input -> output squeezed
    x = x.reshape((-1, x.shape[-1]))
    b, n = x.shape
    hop = hop_length
    k = n_fft // hop

    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        t = 1 + n // hop
    else:
        t = 1 + (n - n_fft) // hop
    rows_needed = t - 1 + k
    need = rows_needed * hop - x.shape[1]
    if need > 0:
        x = jnp.pad(x, ((0, 0), (0, need)))
    rows = x[:, : rows_needed * hop].reshape(b, rows_needed, hop)

    win = get_window(window, n_fft)
    wc, ws = _dft_bases_np(n_fft)
    wc = win[:, None] * wc                      # fold the window into the bases
    ws = win[:, None] * ws
    re = im = 0.0
    for j in range(k):
        seg = rows[:, j: j + t]                 # [B, T, hop] — a slice, no gather
        re = re + jnp.einsum("bth,hf->btf", seg,
                             jnp.asarray(wc[j * hop: (j + 1) * hop]), **_DOT_KW)
        im = im + jnp.einsum("bth,hf->btf", seg,
                             jnp.asarray(ws[j * hop: (j + 1) * hop]), **_DOT_KW)
    # batch_shape is () for 1-D input, so this reshape also squeezes.
    re = re.reshape(batch_shape + re.shape[1:])
    im = im.reshape(batch_shape + im.shape[1:])
    return re, im


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
    if n_fft % hop_length == 0:
        return _istft_segments(re, im, n_fft, hop_length, window, center, length)
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


def _istft_segments(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop_length: int,
                    window: str, center: bool, length: int | None) -> jnp.ndarray:
    """Scatter-free ISTFT for hop | n_fft: the windowed inverse DFT of each
    frame is computed per hop-wide SEGMENT (k matmuls), and overlap-add becomes
    k static slice-adds into the hop-reshaped output — no scatter, pure XLA."""
    batch_shape = re.shape[:-2]          # () for 2-D input -> output squeezed
    re = re.reshape((-1,) + re.shape[-2:])
    im = im.reshape((-1,) + im.shape[-2:])
    b, t, f = re.shape
    hop = hop_length
    k = n_fft // hop

    win_np = get_window(window, n_fft)
    wc, ws = _dft_bases_np(n_fft)
    # Inverse rfft as matmul: x = (1/n_fft) * (re @ (g*cos)^T + im @ (g*sin)^T),
    # g_k = 1 for DC/Nyquist, 2 otherwise (sin basis already negated); the
    # synthesis window folds in too.
    wgt = np.full((f,), 2.0, np.float32)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    icos = (wc * wgt[None, :]).T / n_fft * win_np[None, :]   # [F, n_fft]
    isin = (ws * wgt[None, :]).T / n_fft * win_np[None, :]

    out_rows = t - 1 + k
    y = jnp.zeros((b, out_rows, hop), jnp.float32)
    for j in range(k):
        seg = (jnp.einsum("btf,fh->bth", re,
                          jnp.asarray(icos[:, j * hop: (j + 1) * hop]), **_DOT_KW)
               + jnp.einsum("btf,fh->bth", im,
                            jnp.asarray(isin[:, j * hop: (j + 1) * hop]), **_DOT_KW))
        y = y.at[:, j: j + t].add(seg)   # static slice-add, not a scatter
    out_len = out_rows * hop             # == n_fft + (t - 1) * hop
    y = y.reshape(b, out_len)

    # COLA window-square normalization (precomputed on host — static shapes).
    wsq = np.zeros(out_len, np.float32)
    w2 = win_np * win_np
    for r in range(t):
        wsq[r * hop: r * hop + n_fft] += w2
    y = y / jnp.maximum(jnp.asarray(wsq), 1e-8)

    if center:
        y = y[:, n_fft // 2:]
    if length is not None:
        y = y[:, :length]
        if y.shape[1] < length:
            y = jnp.pad(y, ((0, 0), (0, length - y.shape[1])))
    y = y.reshape(batch_shape + y.shape[1:])
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
