"""Length-masked normalization layers.

Plain GroupNorm/BatchNorm would fold padded frames into their statistics, breaking the
padding-invariance contract (SURVEY.md §4: model outputs identical for a padded batch
vs per-utterance).  MaskedGroupNorm computes mean/var over valid time steps only.

Two implementations behind one module:
- "xla" (the default, impl="auto"): the pure-JAX formulation below.
- "pallas": fused streaming kernels (ops/pallas/gn_kernel.py) that read the
  activation in its storage dtype with f32 accumulation and fuse the site
  activation.

MEASURED DECISION (round 3, BASELINE.md trajectory): the round-2 trace showed
the XLA GN chains running at 1.75x the memory-bound ideal, but swapping in the
Pallas kernels made the full AAS step SLOWER — 494.6 utts/s/chip (258.8 ms)
vs 597.5 (214.2 ms) — because each pallas_call is a fusion boundary: XLA had
been folding the GN apply and activation into the neighboring conv fusions,
and forcing them into standalone HBM passes costs more than the ~3 ms/GN of
stats-pass inefficiency they recover.  Same conclusion as the round-2 Pallas
DSP experiment (dsp/api.py).  "auto" therefore resolves to the XLA path; the
kernels stay available and correctness-tested (tests/test_gn_kernel.py) for
shapes where the trade flips (e.g. GN on tensors too large for XLA's fusion
heuristics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aas_enhancement_tpu.ops.masking import time_mask


def _activate(y: jnp.ndarray, act: str, slope: float) -> jnp.ndarray:
    if act == "leaky_relu":
        return nn.leaky_relu(y, negative_slope=slope)
    if act == "hardtanh":
        return jnp.clip(y, 0.0, 20.0)
    return y


class MaskedGroupNorm(nn.Module):
    """GroupNorm over [B, T, F, C] with per-(batch, group) stats from valid frames.

    act: optional fused activation applied AFTER normalization ("none" |
    "leaky_relu" | "hardtanh") — the conv stems' nonlinearity, folded in so the
    Pallas path writes the activated tensor in one pass.
    """

    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: str = "none"
    negative_slope: float = 0.2
    impl: str = "auto"           # "auto" (= xla, measured faster) | "xla" | "pallas"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        b, t, f, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.impl == "pallas":
            from aas_enhancement_tpu.ops.pallas.gn_kernel import (
                masked_group_norm_act)
            return masked_group_norm_act(
                x, scale, bias, lengths, num_groups=g, eps=self.epsilon,
                act=self.act, slope=self.negative_slope, out_dtype=self.dtype)

        mask = time_mask(lengths, t, jnp.float32)[:, :, None, None]  # [B,T,1,1]
        xf = x.astype(jnp.float32)
        xm = (xf * mask).reshape(b, t, f, g, c // g)
        # Valid-cell count is analytic (lengths * f * c/g) — no broadcast
        # reduction over the full tensor; sum(x) and sum(x^2) fuse into one pass.
        count = jnp.maximum(lengths.astype(jnp.float32) * (f * (c // g)), 1.0)
        mean = jnp.sum(xm, axis=(1, 2, 4)) / count[:, None]          # [B, G]
        sq = jnp.sum(xm * xm, axis=(1, 2, 4)) / count[:, None]   # mask is 0/1
        var = jnp.maximum(sq - mean ** 2, 0.0)

        inv = jax.lax.rsqrt(var + self.epsilon)                      # [B, G]
        # Fold (mean, inv, scale, bias) into one per-(B, C) affine pair.
        inv_c = jnp.reshape(jnp.broadcast_to(inv[:, :, None], (b, g, c // g)),
                            (b, 1, 1, c)) * scale
        off_c = bias - jnp.reshape(
            jnp.broadcast_to((mean * inv)[:, :, None], (b, g, c // g)),
            (b, 1, 1, c)) * scale
        # Op order matters for XLA fusion: affine -> mask -> cast -> act is
        # the round-2 chain measured at 214 ms/step; act BEFORE the mask/cast
        # (in f32) measured 14 ms/step slower (BASELINE.md round-3 table).
        # Equivalent because act(0) == 0 for every supported activation.
        y = (xf * inv_c + off_c) * mask
        return _activate(y.astype(self.dtype), self.act, self.negative_slope)
