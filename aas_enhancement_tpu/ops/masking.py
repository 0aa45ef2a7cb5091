"""Length-mask utilities.

XLA requires static shapes, so variable-length utterances ride in padded buffers with
explicit length vectors — every op must respect them (SURVEY.md §7 "hard parts":
variable-length audio vs XLA static shapes; reference MaskConv equivalent).
"""

from __future__ import annotations

import jax.numpy as jnp


def time_mask(lengths: jnp.ndarray, max_t: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths -> [B, max_t] {0,1} validity mask."""
    t = jnp.arange(max_t, dtype=lengths.dtype)[None, :]
    return (t < lengths[:, None]).astype(dtype)


def apply_time_mask(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded time steps of x: [B, T, ...] with lengths [B]."""
    mask = time_mask(lengths, x.shape[1], x.dtype)
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - 2))


def conv_out_length(lengths: jnp.ndarray, kernel: int, stride: int,
                    padding: str = "SAME") -> jnp.ndarray:
    """Sequence-length arithmetic through a strided conv (reference MaskConv tracks
    this on GPU; here it is plain integer math on the lengths vector)."""
    if padding == "SAME":
        return (lengths + stride - 1) // stride
    return (lengths - kernel) // stride + 1


def masked_mean(x: jnp.ndarray, lengths: jnp.ndarray, axis=(1, 2)) -> jnp.ndarray:
    """Mean of x [B, T, ...] over valid frames only."""
    mask = time_mask(lengths, x.shape[1], x.dtype)
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    num = jnp.sum(x * mask, axis=axis)
    valid_cells = jnp.sum(jnp.broadcast_to(mask, x.shape), axis=axis)
    return num / jnp.maximum(valid_cells, 1.0)
