"""Length-masked normalization layers.

Plain GroupNorm/BatchNorm would fold padded frames into their statistics, breaking the
padding-invariance contract (SURVEY.md §4: model outputs identical for a padded batch
vs per-utterance).  MaskedGroupNorm computes mean/var over valid time steps only.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aas_enhancement_tpu.ops.masking import time_mask


class MaskedGroupNorm(nn.Module):
    """GroupNorm over [B, T, F, C] with per-(batch, group) stats from valid frames."""

    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        b, t, f, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"

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
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # Fold (mean, inv, scale, bias) into one per-(B, C) affine pair.
        inv_c = jnp.reshape(jnp.broadcast_to(inv[:, :, None], (b, g, c // g)),
                            (b, 1, 1, c)) * scale
        off_c = bias - jnp.reshape(
            jnp.broadcast_to((mean * inv)[:, :, None], (b, g, c // g)),
            (b, 1, 1, c)) * scale
        y = xf * inv_c + off_c
        return (y * mask).astype(self.dtype)
