"""Speech-enhancement network: conv stack + BLSTM over log-magnitude spectrograms.

Reference capability (SURVEY.md §2 "Enhancement network", BASELINE.json:5): a
conv + BLSTM network over the noisy log-spectrogram with two output modes —
**mask** (sigmoid mask multiplied onto the noisy magnitude) and **mapping** (direct
enhanced magnitude).  TPU-first deviations from the 2018 GPU design:

- GroupNorm instead of BatchNorm: no running statistics to thread through jit, exact
  behavior at inference batch-1 (the RTF path), and no cross-replica stat syncing on
  the data mesh axis.
- The BLSTM is the fused-gate masked scan from ops/rnn.py (input matmuls hoisted onto
  the MXU).
- All shapes static; padding handled by length masks end-to-end.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aas_enhancement_tpu.config import EnhancerConfig
from aas_enhancement_tpu.ops.masking import apply_time_mask
from aas_enhancement_tpu.ops.norm import MaskedGroupNorm
from aas_enhancement_tpu.ops.rnn import BiRNN


class Enhancer(nn.Module):
    """noisy log1p-magnitude [B, T, F] -> enhancement output [B, T, F].

    mode="mask":    output is a sigmoid mask in (0, 1); enhanced_mag = mask * noisy_mag.
    mode="mapping": output is a non-negative log1p-magnitude; enhanced_mag = expm1(out).
    """

    cfg: EnhancerConfig

    @nn.compact
    def __call__(self, log_mag: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.dtype)
        x = log_mag.astype(dtype)[..., None]            # [B, T, F, 1]

        for i in range(self.cfg.conv_layers):
            # Plain XLA conv: the tap-packed Pallas dW measured ~3.9x SLOWER
            # here (78.7 vs 20.3 ms isolated — M=N=160 leaves the MXU
            # fill-dominated; BASELINE.md round-3 conv-dW experiment).
            x = nn.Conv(self.cfg.conv_channels, kernel_size=(5, 5), strides=(1, 1),
                        padding="SAME", dtype=dtype, name=f"conv{i}")(x)
            # GN zeroes padded frames and leaky_relu(0) == 0; the activation is
            # fused into the norm so the Pallas path writes it in one pass.
            x = MaskedGroupNorm(num_groups=8, dtype=dtype, act="leaky_relu",
                                name=f"gn{i}")(x, lengths)

        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        # One transpose around the whole BLSTM stack (see models/am.py note).
        x = jnp.transpose(x, (1, 0, 2))
        for i in range(self.cfg.rnn_layers):
            x = BiRNN(self.cfg.rnn_hidden, cell="lstm", dtype=dtype,
                      time_major=True, name=f"blstm{i}")(x, lengths)
        x = jnp.transpose(x, (1, 0, 2))

        out = nn.Dense(log_mag.shape[-1], dtype=dtype, name="proj")(x)
        out = out.astype(jnp.float32)

        if self.cfg.mode == "mask":
            out = jax.nn.sigmoid(out)
        else:  # mapping
            out = jax.nn.softplus(out)
        return apply_time_mask(out, lengths)


def blockwise_apply(cfg: EnhancerConfig, params, net_in: jnp.ndarray,
                    lengths: jnp.ndarray, chunk_f: int, look_f: int,
                    hist_f: int) -> jnp.ndarray:
    """Streaming-matched enhancer forward: windows of [history|chunk|lookahead]
    frames, only each window's chunk emitted — the training-time mirror of
    streaming.StreamingEnhancer's block-bidirectional approximation (the BLSTM
    forward state is warm only across `hist_f` frames, the backward direction
    sees only `look_f` future frames).  Fine-tuning through this forward
    closes the streamed-vs-offline quality gap (VERDICT r2 #3).

    All windows batch into one Enhancer call ([B*nb, W, F]) so the whole thing
    stays a single XLA program; differences vs inference: normalization uses
    the full-utterance moments (the running moments converge there) and block
    boundaries are frame- rather than sample-aligned.
    """
    b, t, f = net_in.shape
    nb = -(-t // chunk_f)
    t_pad = nb * chunk_f
    window = hist_f + chunk_f + look_f
    x = jnp.pad(net_in, ((0, 0), (hist_f, t_pad - t + look_f), (0, 0)))
    starts = jnp.arange(nb, dtype=jnp.int32) * chunk_f
    idx = starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    blocks = x[:, idx, :].reshape(b * nb, window, f)
    # Valid frames per block: window position j holds original frame
    # starts[k] - hist_f + j.  Block 0's synthetic leading silence counts as
    # valid input (zeros), exactly like the stream-start history buffer.
    blk_len = jnp.clip(lengths.astype(jnp.int32)[:, None]
                       - (starts[None, :] - hist_f), 0, window)
    out = Enhancer(cfg).apply(params, blocks, blk_len.reshape(b * nb))
    out = out.reshape(b, nb, window, -1)[:, :, hist_f: hist_f + chunk_f, :]
    out = out.reshape(b, t_pad, -1)[:, :t, :]
    return apply_time_mask(out, lengths)


def apply_enhancement(cfg: EnhancerConfig, out: jnp.ndarray,
                      noisy_mag: jnp.ndarray) -> jnp.ndarray:
    """Combine the network output with the noisy magnitude -> enhanced magnitude."""
    if cfg.mode == "mask":
        return out * noisy_mag
    return jnp.expm1(out)


def enhanced_log_mag(cfg: EnhancerConfig, out: jnp.ndarray,
                     noisy_log_mag_raw: jnp.ndarray) -> jnp.ndarray:
    """Enhanced log1p-magnitude (the domain the AM and discriminator consume).

    noisy_log_mag_raw is the UNNORMALIZED log1p magnitude.
    """
    if cfg.mode == "mask":
        return jnp.log1p(out * jnp.expm1(noisy_log_mag_raw))
    return out
