"""DeepSpeech2-style CTC acoustic model.

Reference capability (SURVEY.md §2 "DeepSpeech2-style acoustic model", §3.5): two
masked 2D convs (41x11 / 21x11 kernels, BatchNorm, HardTanh) -> stack of bidirectional
GRUs (sum of directions) -> shared FC -> char logits; CTC-trained, then FROZEN as the
acoustic-supervision teacher during AAS (BASELINE.json:5, :10).

TPU-first design decisions:
- NHWC layout [B, T, F, C] (XLA-preferred on TPU); kernels expressed (time, freq).
- HardTanh(0, 20) kept for parity — it is elementwise and fuses into the conv.
- MaskedGroupNorm instead of BatchNorm (padding-invariant, no running stats in the
  jitted three-network step, batch-size independent at eval).
- BiGRU is the fused-gate masked scan (ops/rnn.py): input projections hoisted onto the
  MXU, `lax.scan` carries only the [B,H]x[H,3H] recurrent matmul.
- Length arithmetic through the strided convs is integer math on the lengths vector
  (ops/masking.conv_out_length), the MaskConv equivalent.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aas_enhancement_tpu.config import AMConfig
from aas_enhancement_tpu.ops.conv import SpaceToDepthConv, TapDWConv
from aas_enhancement_tpu.ops.masking import apply_time_mask, conv_out_length
from aas_enhancement_tpu.ops.norm import MaskedGroupNorm
from aas_enhancement_tpu.ops.rnn import BiRNN


class AcousticModel(nn.Module):
    """log1p-magnitude [B, T, F] + lengths [B] -> (logits [B, T', V], out_lengths [B]).

    T' = ceil(T / 2): conv1 strides 2 in time (and 2 in freq), conv2 strides 2 in freq
    only, mirroring the reference's downsampling.
    """

    cfg: AMConfig

    @nn.compact
    def __call__(self, log_mag: jnp.ndarray, lengths: jnp.ndarray):
        dtype = jnp.dtype(self.cfg.dtype)
        c = self.cfg.conv_channels
        x = log_mag.astype(dtype)[..., None]                  # [B, T, F, 1]

        # conv1: kernel (time=11, freq=41), stride (2, 2).  Space-to-depth
        # evaluation (ops/conv.py): C_in=1 stride-2 convs run at a few percent
        # of MXU peak under XLA; the 2x2 fold is ~3x faster, weight-compatible.
        x = SpaceToDepthConv(c, kernel_size=(11, 41), dtype=dtype,
                             name="conv1")(x)
        out_lengths = conv_out_length(lengths, 11, 2, "SAME")
        # GN zeroes padded frames and hardtanh(0) == 0; the activation is fused
        # into the norm (one write on the Pallas path).
        x = MaskedGroupNorm(num_groups=8, dtype=dtype, act="hardtanh",
                            name="gn1")(x, out_lengths)

        # conv2: kernel (time=11, freq=21), stride (1, 2).  dW stays XLA (the
        # tap-packed Pallas dW measured SLOWER, 38.6 vs 23.8 ms — BASELINE.md
        # round-3); dx uses the fused polyphase conv (conv_dx_phase_fused):
        # XLA's lhs-dilated transposed conv wastes half its MACs on structural
        # zeros; the channel-stacked one-conv phase decomposition measured
        # 9.96 vs 23.78 ms isolated (BASELINE.md conv microbench).
        # AAS_PHASEDX=0 restores the XLA dx (A/B anchor).  Param tree
        # identical to nn.Conv.
        x = TapDWConv(c, kernel_size=(11, 21), strides=(1, 2), dtype=dtype,
                      dw_impl="xla", dx_impl="phase_fused", name="conv2")(x)
        x = MaskedGroupNorm(num_groups=8, dtype=dtype, act="hardtanh",
                            name="gn2")(x, out_lengths)

        b, t, f, ch = x.shape
        x = x.reshape(b, t, f * ch)
        # ONE transpose into time-major for the whole RNN stack (the per-layer
        # stack/flip/moveaxis of the batch-major path cost ~60 ms/step at
        # B=128 — BASELINE.md trace breakdown); transpose back after.
        x = jnp.transpose(x, (1, 0, 2))
        for i in range(self.cfg.rnn_layers):
            x = BiRNN(self.cfg.rnn_hidden, cell=self.cfg.rnn_type, dtype=dtype,
                      time_major=True, name=f"rnn{i}")(x, out_lengths)
        x = jnp.transpose(x, (1, 0, 2))

        # SequenceWise FC (shared across time) -> vocab logits.
        logits = nn.Dense(self.cfg.vocab_size, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        logits = apply_time_mask(logits, out_lengths)
        return logits, out_lengths


def am_blockwise_apply(cfg: AMConfig, params, am_in: jnp.ndarray,
                       lengths: jnp.ndarray, chunk_f: int, look_f: int,
                       hist_f: int):
    """Streaming-matched AM forward: windows of [history|chunk|lookahead]
    input frames, only each window's chunk AM frames emitted — the
    training-time mirror of streaming_asr.StreamingRecognizer's block
    recognition (the BiGRU forward state is warm only across `hist_f` frames,
    the backward direction sees only `look_f` future frames).  Fine-tuning the
    AM through this forward (TrainConfig.streaming_finetune_am) adapts it to
    live block-streaming deployment, the AM-side counterpart of
    enhancer.blockwise_apply.

    Frame arithmetic (streaming_asr.py module docstring): AM frame j centers
    on input frame 2j (conv1 time stride 2, SAME), so window-local AM frames
    [hist_f/2, (hist_f+chunk_f)/2) are exactly the chunk's absolute AM frames
    — `hist_f` and `chunk_f` must be EVEN.  Block 0's leading zero history
    matches the stream-start buffer; all windows batch into ONE AcousticModel
    call so the whole thing stays a single XLA program.  Differences vs live
    inference: normalization uses full-utterance moments (the running moments
    converge there) and the trailing flush block is approximated by the last
    chunk's zero-padded lookahead.

    Returns (logits [B, ceil(T/2), V] on the OFFLINE frame grid, out_lengths)
    so CTC and greedy decoding consume it exactly like the offline forward.
    """
    if chunk_f % 2 or hist_f % 2:
        raise ValueError(
            f"chunk_f ({chunk_f}) and hist_f ({hist_f}) must be EVEN input "
            f"frames for exact AM frame stitching (conv1 time stride 2)")
    b, t, f = am_in.shape
    nb = -(-t // chunk_f)
    t_pad = nb * chunk_f
    window = hist_f + chunk_f + look_f
    x = jnp.pad(am_in, ((0, 0), (hist_f, t_pad - t + look_f), (0, 0)))
    starts = jnp.arange(nb, dtype=jnp.int32) * chunk_f
    idx = starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    blocks = x[:, idx, :].reshape(b * nb, window, f)
    # Valid input frames per block: window position j holds original frame
    # starts[k] - hist_f + j; block 0's synthetic leading silence counts as
    # valid input (zeros), exactly like the stream-start history buffer.
    blk_len = jnp.clip(lengths.astype(jnp.int32)[:, None]
                       - (starts[None, :] - hist_f), 0, window)
    logits, _ = AcousticModel(cfg).apply(params, blocks,
                                         blk_len.reshape(b * nb))
    h_am, c_am = hist_f // 2, chunk_f // 2
    logits = logits.reshape(b, nb, -1, cfg.vocab_size)[
        :, :, h_am: h_am + c_am, :]
    out_lengths = conv_out_length(lengths, 11, 2, "SAME")
    t_off = -(-t // 2)                       # the offline ceil(T/2) grid
    logits = logits.reshape(b, nb * c_am, cfg.vocab_size)[:, :t_off, :]
    return apply_time_mask(logits, out_lengths), out_lengths
