"""Fused masked GroupNorm (+ activation) Pallas kernels.

Perf motivation (BASELINE.md round-2 trace, VERDICT r2 #6): the conv stems'
GroupNorm/elementwise chains are ~27 ms of the 214 ms AAS step at B=128, and
MaskedGroupNorm forward alone measured 1.75x the memory-bound ideal — XLA
materializes an f32 masked intermediate of the [128, 801, 161, 32] activation.
These kernels stream the activation in its storage dtype (bf16 in production)
with f32 accumulation, visiting HBM the minimum number of times:

  forward:  stats pass (read x once)  ->  tiny XLA finalize ([B, C] math)
            apply pass (read x, write y) with the activation fused
  backward: reduce pass (read x, dy)  ->  tiny XLA finalize
            dx pass     (read x, dy, write dx)

The group reduction never happens in-kernel: each kernel produces PER-LANE
partial sums [B, F*C] (a cheap sublane reduction), and XLA folds those 2.6 MB
rows into per-(B, group) stats and per-channel param grads — so no strided
lane gymnastics, and the kernels stay layout-trivial ([B, T, F*C] view of the
conv's native NHWC output).

TPU lowering shape rules (jax/_src/pallas/mosaic/lowering.py): the last two
block dims must divide (8, 128) or equal the array dims, and SMEM scalars
can't be per-grid-step blocked — hence per-(B) rows are carried as
[B, 1, FC] with (1, 1, FC) blocks, and the lengths vector rides whole in
SMEM, indexed by the batch grid coordinate.

Semantics match ops/norm.MaskedGroupNorm exactly (valid-frame statistics,
output masked to zero on padded frames), with the site activation
(leaky_relu / hardtanh(0,20)) optionally fused into the apply/backward
passes.  The pure-JAX reference lives in ops/norm.py; tests compare value and
grad against it in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))


def _act_apply(z, act: str, slope: float):
    if act == "leaky_relu":
        return jnp.where(z >= 0, z, slope * z)
    if act == "hardtanh":
        return jnp.clip(z, 0.0, 20.0)
    return z


def _act_grad(z, act: str, slope: float):
    if act == "leaky_relu":
        return jnp.where(z >= 0, 1.0, slope)
    if act == "hardtanh":
        return ((z >= 0) & (z <= 20.0)).astype(z.dtype)
    return jnp.ones_like(z)


def _t_tile(t: int) -> int:
    return min(t, 128)


def _time_mask_block(len_ref, t_idx: int, tt: int):
    """[Tt, 1] bool validity of this tile's frames.

    len_ref holds the FULL [B] lengths vector in SMEM; index it by the batch
    grid coordinate.  Apply with jnp.where, never multiplication: the final
    tile's rows beyond the array bound are block padding with UNDEFINED
    contents (NaN in interpret mode), and NaN * 0 is NaN."""
    gt = t_idx * tt + jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    return gt < len_ref[pl.program_id(0)]


def _specs(b: int, t: int, fc: int):
    """Common BlockSpecs: (Tt, grid, lengths SMEM, big [1,Tt,FC], per-B row,
    shared-const row)."""
    tt = _t_tile(t)
    return (
        tt,
        (b, pl.cdiv(t, tt)),
        pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tt, fc), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fc), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fc), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    )


# ------------------------------------------------------------------ forward

def _stats_kernel(len_ref, x_ref, sum_ref, sq_ref):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)                       # [Tt, FC]
    m = _time_mask_block(len_ref, t_idx, x.shape[0])       # [Tt, 1]
    xm = jnp.where(m, x, 0.0)
    sum_ref[0] += jnp.sum(xm, axis=0, keepdims=True)
    sq_ref[0] += jnp.sum(xm * xm, axis=0, keepdims=True)


def _lane_stats(x2: jnp.ndarray, lengths: jnp.ndarray, interpret: bool):
    """[B, T, FC] -> per-lane (sum, sumsq) [B, 1, FC] f32 over valid frames."""
    b, t, fc = x2.shape
    _, grid, len_spec, big, row, _ = _specs(b, t, fc)
    return pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[len_spec, big],
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((b, 1, fc), jnp.float32)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x2)


def _make_apply_kernel(act: str, slope: float, out_dtype):
    def kernel(len_ref, x_ref, inv_ref, off_ref, y_ref):
        t_idx = pl.program_id(1)
        x = x_ref[0].astype(jnp.float32)
        z = x * inv_ref[0] + off_ref[0]                    # [1,FC] broadcast
        y = _act_apply(z, act, slope)
        m = _time_mask_block(len_ref, t_idx, x.shape[0])
        y_ref[0, :, :] = jnp.where(m, y, 0.0).astype(out_dtype)
    return kernel


def _apply(x2, lengths, inv_row, off_row, act, slope, out_dtype, interpret):
    b, t, fc = x2.shape
    _, grid, len_spec, big, row, _ = _specs(b, t, fc)
    return pl.pallas_call(
        _make_apply_kernel(act, slope, jnp.dtype(out_dtype)),
        grid=grid,
        in_specs=[len_spec, big, row, row],
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((b, t, fc), jnp.dtype(out_dtype)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x2, inv_row, off_row)


# ----------------------------------------------------------------- backward

def _make_bwd_stats_kernel(act: str, slope: float):
    def kernel(len_ref, x_ref, dy_ref, inv_ref, muinv_ref, sc_ref, bi_ref,
               sdz_ref, sdzx_ref):
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _init():
            sdz_ref[:] = jnp.zeros_like(sdz_ref)
            sdzx_ref[:] = jnp.zeros_like(sdzx_ref)

        x = x_ref[0].astype(jnp.float32)
        dy = dy_ref[0].astype(jnp.float32)
        xhat = x * inv_ref[0] - muinv_ref[0]
        z = xhat * sc_ref[0] + bi_ref[0]
        m = _time_mask_block(len_ref, t_idx, x.shape[0])
        dz = jnp.where(m, dy * _act_grad(z, act, slope), 0.0)
        sdz_ref[0] += jnp.sum(dz, axis=0, keepdims=True)
        sdzx_ref[0] += jnp.sum(jnp.where(m, dz * xhat, 0.0), axis=0,
                               keepdims=True)
    return kernel


def _bwd_lane_stats(x2, dy2, lengths, inv_row, muinv_row, scale_row, bias_row,
                    act, slope, interpret):
    b, t, fc = x2.shape
    _, grid, len_spec, big, row, crow = _specs(b, t, fc)
    return pl.pallas_call(
        _make_bwd_stats_kernel(act, slope),
        grid=grid,
        in_specs=[len_spec, big, big, row, row, crow, crow],
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((b, 1, fc), jnp.float32)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x2, dy2, inv_row, muinv_row,
      scale_row, bias_row)


def _make_dx_kernel(act: str, slope: float, out_dtype):
    def kernel(len_ref, x_ref, dy_ref, inv_ref, muinv_ref, sc_ref, bi_ref,
               a_ref, s1_ref, s2_ref, dx_ref):
        t_idx = pl.program_id(1)
        x = x_ref[0].astype(jnp.float32)
        dy = dy_ref[0].astype(jnp.float32)
        xhat = x * inv_ref[0] - muinv_ref[0]
        z = xhat * sc_ref[0] + bi_ref[0]
        m = _time_mask_block(len_ref, t_idx, x.shape[0])
        dz = jnp.where(m, dy * _act_grad(z, act, slope), 0.0)
        # dx = inv*(scale*dz - mean_g(scale*dz) - xhat*mean_g(scale*dz*xhat));
        # a = scale*inv, s1/s2 rows carry inv*mean_g(scale*dz[*xhat]).
        dx = a_ref[0] * dz - (s1_ref[0] + xhat * s2_ref[0])
        dx_ref[0, :, :] = jnp.where(m, dx, 0.0).astype(out_dtype)
    return kernel


def _dx(x2, dy2, lengths, inv_row, muinv_row, scale_row, bias_row, a_row,
        s1_row, s2_row, act, slope, out_dtype, interpret):
    b, t, fc = x2.shape
    _, grid, len_spec, big, row, crow = _specs(b, t, fc)
    return pl.pallas_call(
        _make_dx_kernel(act, slope, jnp.dtype(out_dtype)),
        grid=grid,
        in_specs=[len_spec, big, big, row, row, crow, crow, row, row, row],
        out_specs=big,
        out_shape=jax.ShapeDtypeStruct((b, t, fc), jnp.dtype(out_dtype)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x2, dy2, inv_row, muinv_row, scale_row,
      bias_row, a_row, s1_row, s2_row)


# ------------------------------------------------------------ orchestration

def _rows(per_bc: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, C] -> [B, 1, F*C] lane rows (repeat across the F positions)."""
    b, c = per_bc.shape
    return jnp.broadcast_to(per_bc[:, None, :], (b, f, c)).reshape(b, 1, f * c)


def _finalize_stats(s1_lane, s2_lane, lengths, f, c, g, eps):
    """Per-lane sums [B, 1, FC] -> (mean, inv) [B, C] f32."""
    b = s1_lane.shape[0]
    sg1 = s1_lane.reshape(b, f, g, c // g).sum(axis=(1, 3))        # [B, G]
    sg2 = s2_lane.reshape(b, f, g, c // g).sum(axis=(1, 3))
    n = jnp.maximum(lengths.astype(jnp.float32) * (f * (c // g)), 1.0)[:, None]
    mean_g = sg1 / n
    var_g = jnp.maximum(sg2 / n - mean_g ** 2, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    rep = lambda v: jnp.repeat(v, c // g, axis=1)                  # [B, C]
    return rep(mean_g), rep(inv_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _gn_pallas(x, scale, bias, lengths, num_groups, eps, act, slope,
               out_dtype, interpret):
    y, _ = _gn_fwd(x, scale, bias, lengths, num_groups, eps, act, slope,
                   out_dtype, interpret)
    return y


def _gn_fwd(x, scale, bias, lengths, num_groups, eps, act, slope,
            out_dtype, interpret):
    b, t, f, c = x.shape
    g = num_groups
    x2 = x.reshape(b, t, f * c)
    s1, s2 = _lane_stats(x2, lengths, interpret)
    mean_c, inv_c = _finalize_stats(s1, s2, lengths, f, c, g, eps)
    scale32 = scale.astype(jnp.float32)
    bias32 = bias.astype(jnp.float32)
    inv_s = inv_c * scale32[None, :]                               # [B, C]
    off_s = bias32[None, :] - mean_c * inv_s
    y2 = _apply(x2, lengths, _rows(inv_s, f), _rows(off_s, f),
                act, slope, out_dtype, interpret)
    return y2.reshape(b, t, f, c), (x, scale, bias, lengths, mean_c, inv_c)


def _gn_bwd(num_groups, eps, act, slope, out_dtype, interpret, res, dy):
    x, scale, bias, lengths, mean_c, inv_c = res
    b, t, f, c = x.shape
    g = num_groups
    x2 = x.reshape(b, t, f * c)
    dy2 = dy.reshape(b, t, f * c)
    scale32 = scale.astype(jnp.float32)
    bias32 = bias.astype(jnp.float32)

    inv_row = _rows(inv_c, f)
    muinv_row = _rows(mean_c * inv_c, f)
    scale_row = jnp.tile(scale32, f).reshape(1, 1, f * c)
    bias_row = jnp.tile(bias32, f).reshape(1, 1, f * c)

    sdz, sdzx = _bwd_lane_stats(x2, dy2, lengths, inv_row, muinv_row,
                                scale_row, bias_row, act, slope, interpret)
    # Param grads: sum the per-lane rows over batch and freq positions.
    dbias = sdz.reshape(b, f, c).sum(axis=(0, 1)).astype(bias.dtype)
    dscale = sdzx.reshape(b, f, c).sum(axis=(0, 1)).astype(scale.dtype)
    # Per-(B, G) reductions for the dx formula: the group means are of
    # scale*dz (= dxhat) and scale*dz*xhat — scale VARIES inside a group, so
    # it must be folded in before the group sum, not after.
    n = jnp.maximum(lengths.astype(jnp.float32) * (f * (c // g)), 1.0)[:, None]
    sdz_s = sdz.reshape(b, f, c) * scale32[None, None, :]
    sdzx_s = sdzx.reshape(b, f, c) * scale32[None, None, :]
    s1_g = sdz_s.reshape(b, f, g, c // g).sum(axis=(1, 3)) / n     # [B, G]
    s2_g = sdzx_s.reshape(b, f, g, c // g).sum(axis=(1, 3)) / n
    rep = lambda v: jnp.repeat(v, c // g, axis=1)
    a_row = _rows(inv_c * scale32[None, :], f)
    s1_row = _rows(inv_c * rep(s1_g), f)
    s2_row = _rows(inv_c * rep(s2_g), f)
    dx2 = _dx(x2, dy2, lengths, inv_row, muinv_row, scale_row, bias_row,
              a_row, s1_row, s2_row, act, slope, x.dtype, interpret)
    return dx2.reshape(b, t, f, c), dscale, dbias, None


_gn_pallas.defvjp(lambda *a: _gn_fwd(*a), _gn_bwd)


def masked_group_norm_act(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, lengths: jnp.ndarray, *,
                          num_groups: int, eps: float = 1e-5,
                          act: str = "none", slope: float = 0.2,
                          out_dtype: Any = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused masked GroupNorm + activation over [B, T, F, C] (Pallas).

    Matches ops/norm.MaskedGroupNorm followed by `act`, with valid-frame
    statistics and padded frames zeroed.  Differentiable wrt x/scale/bias.
    """
    assert x.ndim == 4, x.shape
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} % groups {num_groups}"
    if act not in ("none", "leaky_relu", "hardtanh"):
        raise ValueError(f"unknown act {act!r}")
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    return _gn_pallas(x, scale, bias, lengths, num_groups, eps, act, slope,
                      out_dtype, interpret)
