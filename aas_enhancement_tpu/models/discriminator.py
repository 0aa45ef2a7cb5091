"""Spectrogram discriminator for adversarial supervision.

Reference capability (SURVEY.md §2 "Spectrogram discriminator", BASELINE.json:9): a
conv net that scores log-magnitude spectrograms as real (unpaired clean corpus) vs
fake (enhanced).  TPU-first details:

- Strided 2D convs over [T, F] with channel growth; masked global average pooling over
  valid frames (replaces flatten+FC so arbitrary bucket lengths share one head).
- No normalization layers that mix batch elements — per-sample behavior is identical
  under any data-parallel sharding.
- Raw scores returned; LSGAN/BCE losses live in train/objectives.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aas_enhancement_tpu.config import DiscriminatorConfig
from aas_enhancement_tpu.ops.masking import apply_time_mask, conv_out_length, masked_mean


class Discriminator(nn.Module):
    """log1p-magnitude [B, T, F] -> score [B] (real > fake under LSGAN targets)."""

    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, log_mag: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.dtype)
        x = log_mag.astype(dtype)[..., None]           # [B, T, F, 1]
        cur_lengths = lengths
        for i, ch in enumerate(self.cfg.channels):
            x = nn.Conv(ch, kernel_size=(5, 5), strides=(2, 2), padding="SAME",
                        dtype=dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            cur_lengths = conv_out_length(cur_lengths, 5, 2, "SAME")
            x = apply_time_mask(x, cur_lengths)

        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c).astype(jnp.float32)
        pooled = masked_mean(x, cur_lengths, axis=(1,))  # [B, F*C]
        score = nn.Dense(1, dtype=jnp.float32, name="head")(pooled)
        return score[:, 0]
