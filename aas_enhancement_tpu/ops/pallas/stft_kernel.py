"""Fused Pallas STFT / ISTFT kernels (SURVEY.md §2 rebuild obligation #2).

Design (TPU-first, for the reference's 50%-overlap configuration n_fft == 2*hop):

- **Framing without gathers or reshapes**: the caller views the signal as hop-wide
  rows [B, R, hop]; frame t = (row t, row t+1).  Rather than materializing frames,
  the DFT matmul is split into head/tail halves:
      frames @ W  =  (rows[:-1] * win_head) @ W_head + (rows[1:] * win_tail) @ W_tail
  so the kernel only row-slices its VMEM chunk — no concat, no reshape (Mosaic
  rejects non-lane-aligned reshapes), no [T, n_fft] frame matrix in HBM.
- **DFT as matmul**: real/imag DFT bases live in VMEM; each frame tile is four MXU
  matmuls with K = hop.  For n_fft <= 1024 this runs at MXU speed and beats
  bandwidth-bound FFT butterflies on TPU.
- **Per grid step** the kernel DMAs one overlapping row-range HBM->VMEM, windows,
  transforms — one pass over the audio, one write of (re, im).
- **ISTFT overlap-add without scatter**: with 50% overlap, output row r (hop wide)
  = tail-half(frame r-1) + head-half(frame r); the cross-chunk seam row is emitted
  separately and added by the caller.  COLA window-square normalization happens
  outside (elementwise; XLA fuses it).

Falls back to the pure-JAX implementation (dsp/stft.py) when n_fft != 2*hop; both
are exposed through the same dispatcher in dsp/api.py.  Numerics validated against
the pure-JAX path in tests/test_pallas_stft.py (interpret mode on CPU, real kernels
on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aas_enhancement_tpu.dsp.stft import get_window

TILE_T = 128  # frames per grid step


def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: cos/(-sin) matrices [n_fft, n_fft//2+1] (rfft convention)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


_DOT_KW = dict(preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST)


def _stft_kernel(heads_ref, tails_ref, win_ref, wch_ref, wct_ref, wsh_ref, wst_ref,
                 re_ref, im_ref):
    # Frame t = (row t, row t+1) of the hop-reshaped signal.  The caller passes
    # the rows array twice, the second shifted by one row, so both stream through
    # the standard Pallas pipeline as plain [TILE_T, hop] blocks (manual DMA of a
    # 160-lane slice violates Mosaic's 128-lane slice alignment).
    hop = heads_ref.shape[2]
    heads = heads_ref[0] * win_ref[0, :hop][None, :]
    tails = tails_ref[0] * win_ref[0, hop:][None, :]
    re_ref[0] = (jnp.dot(heads, wch_ref[:], **_DOT_KW)
                 + jnp.dot(tails, wct_ref[:], **_DOT_KW))
    im_ref[0] = (jnp.dot(heads, wsh_ref[:], **_DOT_KW)
                 + jnp.dot(tails, wst_ref[:], **_DOT_KW))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window",
                                             "center", "interpret"))
def stft_pallas(x: jnp.ndarray, n_fft: int, hop_length: int, window: str = "hann",
                center: bool = True, interpret: bool = False):
    """[B, num_samples] -> (re, im) each [B, T, n_fft//2+1].  Requires n_fft==2*hop."""
    assert n_fft == 2 * hop_length, "pallas stft requires 50% overlap (n_fft == 2*hop)"
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    b, n = x.shape
    f = n_fft // 2 + 1
    hop = hop_length

    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        t = 1 + n // hop
    else:
        t = 1 + (n - n_fft) // hop

    t_padded = ((t + TILE_T - 1) // TILE_T) * TILE_T
    need = (t_padded + 1) * hop - x.shape[1]
    if need > 0:
        x = jnp.pad(x, ((0, 0), (0, need)))
    rows = x[:, : (t_padded + 1) * hop].reshape(b, t_padded + 1, hop)
    heads_rows = rows[:, :t_padded]
    tails_rows = rows[:, 1:]

    win = jnp.asarray(get_window(window, n_fft))[None, :]
    wc_np, ws_np = _dft_bases(n_fft)
    wch, wct = jnp.asarray(wc_np[:hop]), jnp.asarray(wc_np[hop:])
    wsh, wst = jnp.asarray(ws_np[:hop]), jnp.asarray(ws_np[hop:])

    grid = (b, t_padded // TILE_T)
    const = lambda i, j: (0, 0)  # noqa: E731
    re, im = pl.pallas_call(
        _stft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_T, hop), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),                      # head rows
            pl.BlockSpec((1, TILE_T, hop), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),                      # tail rows
            pl.BlockSpec((1, n_fft), const, memory_space=pltpu.VMEM),   # window
            pl.BlockSpec((hop, f), const, memory_space=pltpu.VMEM),     # cos head
            pl.BlockSpec((hop, f), const, memory_space=pltpu.VMEM),     # cos tail
            pl.BlockSpec((hop, f), const, memory_space=pltpu.VMEM),     # sin head
            pl.BlockSpec((hop, f), const, memory_space=pltpu.VMEM),     # sin tail
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_T, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_padded, f), jnp.float32),
            jax.ShapeDtypeStruct((b, t_padded, f), jnp.float32),
        ],
        interpret=interpret,
    )(heads_rows, tails_rows, win, wch, wct, wsh, wst)

    re, im = re[:, :t], im[:, :t]
    if squeeze:
        re, im = re[0], im[0]
    return re, im


def _istft_kernel(re_ref, im_ref, ich_ref, ish_ref, ict_ref, ist_ref, win_ref,
                  body_ref, seam_ref):
    # Inverse real DFT as matmul, split into head/tail hop-halves of each frame.
    re_t = re_ref[0]
    im_t = im_ref[0]
    hop = win_ref.shape[1] // 2
    heads = (jnp.dot(re_t, ich_ref[:], **_DOT_KW)
             + jnp.dot(im_t, ish_ref[:], **_DOT_KW))
    tails = (jnp.dot(re_t, ict_ref[:], **_DOT_KW)
             + jnp.dot(im_t, ist_ref[:], **_DOT_KW))
    heads = heads * win_ref[0, :hop][None, :]
    tails = tails * win_ref[0, hop:][None, :]

    # Body rows r: heads[r] + tails[r-1].  Offset slicing is not tile-aligned,
    # so shift via roll and zero row 0 with an iota mask; the rolled row 0
    # (== tails[-1]) doubles as the seam carried to the next chunk.
    shifted = pltpu.roll(tails, shift=1, axis=0)     # shifted[r] = tails[r-1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_T, hop), 0)
    body_ref[0] = heads + jnp.where(row_ids == 0, 0.0, shifted)
    seam_ref[0] = shifted[:8]                         # row 0 real, rows 1-7 unused


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window",
                                             "center", "length", "interpret"))
def istft_pallas(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop_length: int,
                 window: str = "hann", center: bool = True,
                 length: int | None = None, interpret: bool = False) -> jnp.ndarray:
    """(re, im) [B, T, F] -> wav [B, num_samples].  Requires n_fft == 2*hop."""
    assert n_fft == 2 * hop_length
    squeeze = re.ndim == 2
    if squeeze:
        re, im = re[None], im[None]
    b, t, f = re.shape
    hop = hop_length

    t_padded = ((t + TILE_T - 1) // TILE_T) * TILE_T
    re = jnp.pad(re, ((0, 0), (0, t_padded - t), (0, 0)))
    im = jnp.pad(im, ((0, 0), (0, t_padded - t), (0, 0)))

    win_np = get_window(window, n_fft)
    win = jnp.asarray(win_np)[None, :]
    wc_np, ws_np = _dft_bases(n_fft)
    # Inverse rfft as matmul: x = (1/n_fft) * (re @ (w*cos)^T + im @ (w*sin)^T),
    # w_k = 1 for DC/Nyquist, 2 otherwise (sin basis already negated).
    wgt = np.full((f,), 2.0, np.float32)
    wgt[0] = 1.0
    if n_fft % 2 == 0:
        wgt[-1] = 1.0
    icos = (wc_np * wgt[None, :]).T / n_fft          # [F, n_fft]
    isin = (ws_np * wgt[None, :]).T / n_fft          # [F, n_fft]
    ich, ict = jnp.asarray(icos[:, :hop]), jnp.asarray(icos[:, hop:])
    ish, ist = jnp.asarray(isin[:, :hop]), jnp.asarray(isin[:, hop:])

    n_chunks = t_padded // TILE_T
    grid = (b, n_chunks)
    const = lambda i, j: (0, 0)  # noqa: E731
    body, seam = pl.pallas_call(
        _istft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_T, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, hop), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_T, hop), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, hop), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_padded, hop), jnp.float32),
            jax.ShapeDtypeStruct((b, n_chunks * 8, hop), jnp.float32),
        ],
        interpret=interpret,
    )(re, im, ich, ish, ict, ist, win)
    seam = seam[:, ::8]                               # row 0 of each 8-row block

    chunk_len = TILE_T * hop
    total_len = t_padded * hop
    y = jnp.pad(body.reshape(b, total_len), ((0, 0), (0, hop)))
    # Add each chunk's seam at the head of the NEXT chunk's body.
    idx = (np.arange(n_chunks)[:, None] * chunk_len + chunk_len
           + np.arange(hop)[None, :]).reshape(-1)
    y = y.at[:, jnp.asarray(idx)].add(seam.reshape(b, -1))

    # COLA window-square normalization over the real t frames (padded frames are
    # all-zero and only touch positions beyond the trimmed output).
    wsq = np.zeros(total_len + hop + n_fft, np.float32)
    w2 = win_np * win_np
    for r in range(t):
        wsq[r * hop: r * hop + n_fft] += w2
    y = y / jnp.maximum(jnp.asarray(wsq[: total_len + hop]), 1e-8)

    if center:
        # Match the pure-JAX istft exactly: it slices [n_fft//2:] off the full
        # (t-1)*hop + n_fft overlap-add buffer, leaving (t-1)*hop + n_fft//2.
        y = y[:, n_fft // 2:]
        out_len = (t - 1) * hop + n_fft // 2
    else:
        out_len = (t - 1) * hop + n_fft
    y = y[:, : out_len if length is None else length]
    if length is not None and y.shape[1] < length:
        y = jnp.pad(y, ((0, 0), (0, length - y.shape[1])))
    if squeeze:
        y = y[0]
    return y
