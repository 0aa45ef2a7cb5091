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


def spec_augment(key, x: jnp.ndarray, lengths: jnp.ndarray,
                 n_time: int = 2, time_width: int = 30,
                 n_freq: int = 2, freq_width: int = 13) -> jnp.ndarray:
    """SpecAugment-style time + frequency masking on [B, T, F] features.

    Beyond-reference regularizer (Park et al. 2019) for AM training on small
    corpora: per utterance, `n_time` random time stripes of width <=
    `time_width` frames (placed inside the VALID region given by `lengths`)
    and `n_freq` frequency stripes of width <= `freq_width` bins are zeroed.
    Applied after per-utterance normalization, so zero == the feature mean.
    Pure jax.random — jit/vmap/pjit-safe, deterministic per key.
    """
    import jax

    b, t, f = x.shape
    kt_w, kt_s, kf_w, kf_s = jax.random.split(key, 4)

    def stripe_keep(kw, ks, n, max_w, size, limit):
        """[B, size] keep-mask with n stripes of width<=max_w inside
        [0, limit_b) per row."""
        w = jax.random.randint(kw, (b, n), 0, max_w + 1)
        hi = jnp.maximum(limit[:, None] - w, 1).astype(jnp.float32)
        start = jnp.floor(jax.random.uniform(ks, (b, n)) * hi).astype(jnp.int32)
        pos = jnp.arange(size, dtype=jnp.int32)[None, None, :]
        inside = (pos >= start[..., None]) & (pos < (start + w)[..., None])
        return ~jnp.any(inside, axis=1)

    keep_t = stripe_keep(kt_w, kt_s, n_time, time_width, t,
                         lengths.astype(jnp.int32))
    keep_f = stripe_keep(kf_w, kf_s, n_freq, freq_width, f,
                         jnp.full((b,), f, jnp.int32))
    return x * keep_t[:, :, None].astype(x.dtype) \
             * keep_f[:, None, :].astype(x.dtype)
