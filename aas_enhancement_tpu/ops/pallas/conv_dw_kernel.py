"""Tap-packed conv weight-gradient (dW) Pallas kernel.

Why this exists (BASELINE.md "Conv dW microbench"): dW for the production
convs (C_in = C_out = 32) is a matmul whose two non-contraction dims are both
32 — ~25% lane utilization on a 128-wide MXU *by construction*, and XLA
measures 4.4–4.7x off the dense roofline on all three conv stems.  The fix is
to pack the kernel TAPS into the matmul output dims:

    dW[dt, df, ci, co] = sum_{b,t,f'} A[b,t,f',(dt,ci)] * Bm[b,t,f',(df,co)]
      A [b,t,f',(dt,ci)] = x_pad[b, t+dt, f', ci]        (t-shifted x)
      Bm[b,t,f',(df,co)] = dy[b, t, f'-df, co]           (f-shifted dy, 0 pad)

one [kt*ci x N] x [N x kf*co] matmul with N = B*T*Fp — 160x160 output for the
5x5 enhancer convs, 352x352 for the acoustic model's 11x21 (after the f-stride
phase split), i.e. ~39% / ~84% MXU tile utilization instead of ~6%.

Doing the shift-packing at the XLA level would materialize kt,x / kf,dy
replicas in HBM (several GB of traffic at these shapes); the Pallas kernel
builds A and Bm in VMEM from each tile, so x and dy are read from HBM once
(x twice: the t-halo is realized by passing x under a second, +1-shifted
BlockSpec — Pallas blocks cannot overlap).

Scope: stride (1, 1) directly; stride (1, 2) via the frequency phase split in
ops/conv.py.  The forward conv and dx stay on XLA's native conv (measured at
or near their rooflines in-step).

MEASURED OUTCOME (round 3, v5e, scripts/conv_dw_bench.py): the kernel is
correct but LOSES to XLA's conv VJP on the production shapes — G.conv1
78.7 ms vs XLA 20.3; AM.conv2 s(1,1) 40.4 vs 43.4 (par); AM.conv2 s(1,2)
38.6 vs 23.8 — so it is NOT wired into the models (TapDWConv exists but
defaults stay on nn.Conv).  Root cause, isolated with a minimal two-kernel
diagnostic: a [5376,160]x[5376,160] bf16 tile matmul runs at ~3.5% of MXU
peak (~40 us/step) REGARDLESS of lhs transposition — with M = N = 160 the
128x128 systolic array is fill-dominated and mostly idle, and tap-packing
cannot make M/N large enough for 5x5 32-channel convs (kt*ci = kf*co = 160).
The 11x21 shape (M=352, N=672, 36% of peak) is the only one that reaches
par.  Kept as a tested, documented experiment per the BASELINE.md
measure-and-record protocol.

Reference capability: this targets the same math torch's cudnn conv
backward provides the reference (SURVEY.md §2 acoustic-model/enhancer convs);
the formulation is TPU-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_tb(fp: int, f: int, ci: int, co: int, kt: int, kf: int,
             itemsize: int) -> int:
    """Largest T-tile whose working set fits the VMEM budget.

    Per grid step: two x blocks [TB, Fp, ci], one dy block [TB, F, co], the
    packed operands A [TB, Fp, kt*ci] and Bm [TB, Fp, kf*co] (plus ~1 slack
    copy each for the concat intermediates), and the f32 accumulator.
    """
    acc = kt * ci * kf * co * 4
    for tb in (128, 64, 32, 16, 8):
        per_t = (2 * fp * ci + f * co + 2 * fp * kt * ci
                 + 2 * fp * kf * co) * itemsize
        if acc + tb * per_t <= _VMEM_BUDGET:
            return tb
    return 8


def _dw_kernel(x1_ref, x2_ref, dy_ref, out_ref, *, kt, kf, tb, fp, f):
    """One (batch row, T-tile) grid step: pack taps, matmul, accumulate."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    x1 = x1_ref[0]                      # [TB, Fp, ci]
    dyt = dy_ref[0]                     # [TB, F,  co]
    ci = x1.shape[-1]
    co = dyt.shape[-1]

    if kt > 1:
        xr = jnp.concatenate([x1, x2_ref[0][: kt - 1]], axis=0)
    else:
        xr = x1
    # A[t, f', dt*ci + ci] = x[t + dt, f', ci]
    a = jnp.concatenate([xr[dt: dt + tb] for dt in range(kt)], axis=-1)
    # Bm[t, f', df*co + co] = dy[t, f' - df, co] (zero outside [0, F))
    cols = [jnp.pad(dyt, ((0, 0), (df, fp - f - df), (0, 0)))
            for df in range(kf)]
    bm = jnp.concatenate(cols, axis=-1)

    contrib = jax.lax.dot_general(
        a.reshape(tb * fp, kt * ci), bm.reshape(tb * fp, kf * co),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(first)
    def _init():
        out_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[...] += contrib


def conv_dw_s1(xp: jnp.ndarray, dy: jnp.ndarray, kt: int, kf: int,
               interpret: bool = False) -> jnp.ndarray:
    """dW for a stride-(1,1) conv given the already-padded input.

    xp: [B, T + kt - 1, F + kf - 1, ci] (the conv's padded input)
    dy: [B, T, F, co]                    (output cotangent)
    Returns dW [kt, kf, ci, co] in f32 (accumulation dtype).
    """
    b, tp, fpx, ci = xp.shape
    _, t, f, co = dy.shape
    fp = f + kf - 1
    if tp != t + kt - 1 or fpx != fp:
        raise ValueError(f"padded-shape mismatch: xp {xp.shape} dy {dy.shape} "
                         f"k=({kt},{kf})")

    # Mosaic can only collapse [TB, Fp, .] -> [TB*Fp, .] when Fp is a multiple
    # of the dtype's sublane tile (8 rows x 32 bits packed); align it with zero
    # columns — zero x times anything contributes nothing to dW.
    sublane = 8 * 4 // xp.dtype.itemsize
    fp_al = -(-fp // sublane) * sublane
    if fp_al != fp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, fp_al - fp), (0, 0)))
        fp = fp_al

    tb = _pick_tb(fp, f, ci, co, kt, kf, xp.dtype.itemsize)
    n_t = -(-t // tb)
    # dy T-pad to the tile grid; xp gets one EXTRA tile of zero rows so the
    # +1-shifted halo BlockSpec is always in range (zero rows contribute 0).
    dy = jnp.pad(dy, ((0, 0), (0, n_t * tb - t), (0, 0), (0, 0)))
    xp = jnp.pad(xp, ((0, 0), (0, (n_t + 1) * tb - tp), (0, 0), (0, 0)))

    kern = functools.partial(_dw_kernel, kt=kt, kf=kf, tb=tb, fp=fp, f=f)
    out = pl.pallas_call(
        kern,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, tb, fp, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, tb, fp, ci), lambda i, j: (i, j + 1, 0, 0)),
            pl.BlockSpec((1, tb, f, co), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kt * ci, kf * co), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((kt * ci, kf * co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, xp, dy)
    return (out.reshape(kt, ci, kf, co).transpose(0, 2, 1, 3))


def _same_pads(size: int, k: int, s: int) -> tuple[int, int]:
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def conv_dw_same(x: jnp.ndarray, dy: jnp.ndarray, kt: int, kf: int,
                 strides: tuple[int, int] = (1, 1),
                 interpret: bool = False) -> jnp.ndarray:
    """dW for a SAME-padded conv.  strides (1,1) direct; (1,2) via the
    frequency phase split: taps df = 2j+p only ever see x's f-parity-p
    subgrid, so dW[:, 2j+p] = stride-1 dW(x_phase_p, dy)[:, j]."""
    b, t, f, ci = x.shape
    st, sf = strides
    if st != 1 or sf not in (1, 2):
        raise NotImplementedError(f"strides {strides}")
    (pt0, pt1) = _same_pads(t, kt, st)
    (pf0, pf1) = _same_pads(f, kf, sf)
    xp = jnp.pad(x, ((0, 0), (pt0, pt1), (pf0, pf1), (0, 0)))
    if sf == 1:
        return conv_dw_s1(xp, dy, kt, kf, interpret=interpret)

    out_f = dy.shape[2]
    dw = jnp.zeros((kt, kf, ci, dy.shape[-1]), jnp.float32)
    for p in range(2):
        kf_p = -(-(kf - p) // 2)
        x_p = xp[:, :, p::2, :]
        need = out_f + kf_p - 1          # stride-1 padded width for the phase
        x_p = x_p[:, :, :need, :]
        if x_p.shape[2] < need:
            x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, need - x_p.shape[2]),
                                (0, 0)))
        dw_p = conv_dw_s1(x_p, dy, kt, kf_p, interpret=interpret)
        dw = dw.at[:, p::2].set(dw_p)
    return dw
