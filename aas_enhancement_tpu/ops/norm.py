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
        xg = (xf * mask).reshape(b, t, f, g, c // g)
        mg = jnp.broadcast_to(mask[..., None], (b, t, f, g, c // g))

        count = jnp.maximum(jnp.sum(mg, axis=(1, 2, 4)), 1.0)        # [B, G]
        mean = jnp.sum(xg, axis=(1, 2, 4)) / count                   # [B, G]
        # E[x^2] - E[x]^2 over valid cells.
        sq = jnp.sum((xf.reshape(b, t, f, g, c // g) ** 2) * mg, axis=(1, 2, 4)) / count
        var = jnp.maximum(sq - mean ** 2, 0.0)

        mean_b = jnp.repeat(mean, c // g, axis=-1).reshape(b, 1, 1, c)
        var_b = jnp.repeat(var, c // g, axis=-1).reshape(b, 1, 1, c)
        y = (xf - mean_b) * jax.lax.rsqrt(var_b + self.epsilon)

        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = y * scale + bias
        return (y * mask).astype(self.dtype)
