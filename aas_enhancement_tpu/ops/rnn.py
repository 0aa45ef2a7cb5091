"""Masked bidirectional recurrent layers for TPU.

The reference's hot inner loop is cuDNN BLSTM/BiGRU inside `BatchRNN` (sum of
directions, packed sequences — SURVEY.md §3.5).  The TPU-native design:

- **All input-side gate matmuls are hoisted out of the time loop** into one large
  [B*T, D] x [D, 2*G*H] matmul (both directions at once) that saturates the MXU.
- **Both directions run in ONE `lax.scan`**: the carry is stacked [2, B, H] and the
  recurrent matmul is a batched dot ([2,B,H] x [2,H,G*H]), so each layer costs one
  sequential loop instead of two and the per-step matmul is twice as large — both
  wins on TPU, where scan iteration overhead and small matmuls are the enemies.
- The backward direction consumes the time-flipped gate sequence; because padded
  steps never update the carry (validity mask), right-padding (left-padding after
  the flip) leaves the backward state at zeros until real frames begin.
- `unroll` trades compile time for fewer loop iterations (default 4).

Directions are summed, matching the reference's BatchRNN sum-of-directions.
Padding contract: outputs at padded steps are zero and valid-step outputs are
bit-identical to an unpadded per-utterance run (tests/test_rnn.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aas_enhancement_tpu.ops.masking import time_mask


def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return "tpu" in (dev.platform + " " + getattr(dev, "device_kind", "")).lower()


class BiRNN(nn.Module):
    """Bidirectional GRU/LSTM, sum of directions (reference BatchRNN parity,
    SURVEY.md §2 "DeepSpeech2-style acoustic model").

    impl: "auto" uses the fused Pallas recurrence kernels (ops/pallas/rnn_kernel)
    on TPU and the lax.scan path elsewhere; "xla"/"pallas" force a path.
    """

    hidden: int
    cell: str = "gru"            # "gru" | "lstm"
    dtype: jnp.dtype = jnp.float32
    unroll: int = 4
    impl: str = "auto"           # "auto" | "xla" | "pallas"
    time_major: bool = False     # x is [T,B,F] -> [T,B,H] (no per-layer
                                 # transposes: the Pallas path consumes the
                                 # hoisted gates as-is and realizes direction
                                 # 1's time reversal in its index maps)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[0] if self.time_major else x.shape[1]
        b = x.shape[1] if self.time_major else x.shape[0]
        h = self.hidden
        g = 3 if self.cell == "gru" else 4
        dtype = self.dtype
        x = x.astype(dtype)

        # One hoisted MXU matmul for both directions' input gates.
        gates = nn.Dense(2 * g * h, dtype=dtype, name="wx")(x)
        w_h = self.param("wh", nn.initializers.orthogonal(),
                         (2, h, g * h), jnp.float32).astype(dtype)
        b_h = self.param("bh", nn.initializers.zeros,
                         (2, g * h), jnp.float32).astype(dtype)

        use_pallas = self.impl == "pallas" or (self.impl == "auto" and _on_tpu())

        if self.time_major:
            # gates: [T,B,2GH]; first GH features are direction 0 (same
            # parameter layout as the batch-major path's reshape).
            gxf, gxb = gates[..., : g * h], gates[..., g * h:]
            m_tm = time_mask(lengths, t, jnp.float32).T              # [T,B]
            if use_pallas:
                from aas_enhancement_tpu.ops.pallas.rnn_kernel import (
                    gru_scan_tm, lstm_scan_tm)
                fn = gru_scan_tm if self.cell == "gru" else lstm_scan_tm
                yf, yb = fn(gxf, gxb, m_tm, w_h.astype(jnp.float32),
                            b_h.astype(jnp.float32), not _on_tpu())
                return (yf + yb).astype(dtype)
            # XLA fallback: route through the stacked layout.
            gx = jnp.stack([gxf, jnp.flip(gxb, axis=0)], axis=1)     # [T,2,B,GH]
            m = jnp.stack([m_tm, jnp.flip(m_tm, axis=0)],
                          axis=1)[..., None].astype(dtype)           # [T,2,B,1]
            ys = self._xla_scan(gx, m, w_h, b_h, b)
            return (ys[:, 0] + jnp.flip(ys[:, 1], axis=0)).astype(dtype)

        gates = gates.reshape(b, t, 2, g * h)
        mask = time_mask(lengths, t, dtype)                          # [B,T]
        # Per-step stacked inputs: dir 0 forward order, dir 1 time-flipped.
        gx = jnp.stack([gates[:, :, 0], jnp.flip(gates[:, :, 1], axis=1)], axis=0)
        gx = jnp.moveaxis(gx, 2, 0)                                  # [T,2,B,GH]
        m = jnp.stack([mask, jnp.flip(mask, axis=1)], axis=0)        # [2,B,T]
        m = jnp.moveaxis(m, 2, 0)[..., None]                         # [T,2,B,1]

        if use_pallas:
            from aas_enhancement_tpu.ops.pallas.rnn_kernel import (
                gru_scan_pallas, lstm_scan_pallas)
            w_h32 = w_h.astype(jnp.float32)
            b_h32 = b_h.astype(jnp.float32)
            interp = not _on_tpu()
            if self.cell == "gru":
                ys = gru_scan_pallas(gx, m[..., 0], w_h32, b_h32, interp)
            else:
                ys = lstm_scan_pallas(gx, m[..., 0], w_h32, b_h32, interp)
            fwd = jnp.moveaxis(ys[:, 0], 0, 1)
            bwd = jnp.flip(jnp.moveaxis(ys[:, 1], 0, 1), axis=1)
            return (fwd + bwd).astype(dtype)

        ys = self._xla_scan(gx, m, w_h, b_h, b)
        # ys: [T,2,B,H] -> fwd [B,T,H] + time-flipped bwd.
        fwd = jnp.moveaxis(ys[:, 0], 0, 1)
        bwd = jnp.flip(jnp.moveaxis(ys[:, 1], 0, 1), axis=1)
        return fwd + bwd

    def _xla_scan(self, gx, m, w_h, b_h, b):
        """Masked bidirectional scan over stacked [T,2,B,·] inputs -> [T,2,B,H]."""
        h = self.hidden
        dtype = self.dtype

        def rec_matmul(hs):                                          # [2,B,H]
            return jax.lax.dot_general(
                hs, w_h, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype) + b_h[:, None, :]

        if self.cell == "gru":
            def step(carry, inp):
                gx_t, m_t = inp
                h_prev = carry
                gh = rec_matmul(h_prev)
                xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h_prev
                h_new = m_t * h_new + (1.0 - m_t) * h_prev
                return h_new, h_new * m_t

            carry0 = jnp.zeros((2, b, h), dtype)
        else:  # lstm
            def step(carry, inp):
                gx_t, m_t = inp
                h_prev, c_prev = carry
                gg = gx_t + rec_matmul(h_prev)
                i, f, gc, o = jnp.split(gg, 4, axis=-1)
                c_new = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gc)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                h_new = m_t * h_new + (1.0 - m_t) * h_prev
                c_new = m_t * c_new + (1.0 - m_t) * c_prev
                return (h_new, c_new), h_new * m_t

            carry0 = (jnp.zeros((2, b, h), dtype), jnp.zeros((2, b, h), dtype))

        _, ys = jax.lax.scan(step, carry0, (gx, m), unroll=self.unroll)
        return ys
