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


def masked_normalize(x: jnp.ndarray, lengths: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Per-utterance mean/std normalization of [B, T, F] over VALID frames only,
    with padded frames zeroed (the deepspeech-style per-utterance norm, made
    padding-invariant)."""
    mask = time_mask(lengths, x.shape[1], x.dtype)[:, :, None]
    count = jnp.maximum(jnp.sum(mask, axis=(1, 2), keepdims=True) * x.shape[2], 1.0)
    mean = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(((x - mean) ** 2) * mask, axis=(1, 2), keepdims=True) / count
    return ((x - mean) / jnp.sqrt(var + eps)) * mask


def masked_mean(x: jnp.ndarray, lengths: jnp.ndarray, axis=(1, 2)) -> jnp.ndarray:
    """Mean of x [B, T, ...] over valid frames only."""
    mask = time_mask(lengths, x.shape[1], x.dtype)
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
    num = jnp.sum(x * mask, axis=axis)
    valid_cells = jnp.sum(jnp.broadcast_to(mask, x.shape), axis=axis)
    return num / jnp.maximum(valid_cells, 1.0)
