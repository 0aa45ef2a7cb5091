"""Masked bidirectional recurrent layers for TPU.

The reference's hot inner loop is cuDNN BLSTM/BiGRU inside `BatchRNN` (sum of
directions, packed sequences — SURVEY.md §3.5).  The TPU-native design:

- **All input-side gate matmuls are hoisted out of the time loop** into one large
  [B*T, D] x [D, G*H] matmul that saturates the MXU.
- The `lax.scan` body then contains only the [B, H] x [H, G*H] recurrent matmul and
  elementwise gate math (VPU), the minimal sequential work.
- Padding is handled by a validity mask: the hidden state freezes at padded steps, so
  a padded batch produces bit-identical valid-frame outputs to per-utterance runs
  (SURVEY.md §4 masking/padding invariance test).
- The backward direction runs the same scan on the time-reversed padded buffer;
  because padded steps never update state, right-padding (which becomes left-padding
  after the flip) leaves the carry at its initial zeros until real frames begin.

Directions are summed, matching the reference's BatchRNN sum-of-directions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aas_enhancement_tpu.ops.masking import time_mask


def _scan_rnn(cell_step, gates_x: jnp.ndarray, mask: jnp.ndarray, carry_init):
    """Run cell_step over time.  gates_x: [B, T, G*H], mask: [B, T]."""
    gx = jnp.swapaxes(gates_x, 0, 1)          # [T, B, G*H]
    m = jnp.swapaxes(mask, 0, 1)[..., None]   # [T, B, 1]

    def step(carry, inp):
        gx_t, m_t = inp
        new_carry, out = cell_step(carry, gx_t)
        # Freeze state at padded steps.
        new_carry = jax.tree.map(lambda n, o: m_t * n + (1.0 - m_t) * o,
                                 new_carry, carry)
        return new_carry, out * m_t

    _, ys = jax.lax.scan(step, carry_init, (gx, m))
    return jnp.swapaxes(ys, 0, 1)             # [B, T, H]


class _RNNDirection(nn.Module):
    """One direction of a GRU/LSTM over a padded batch."""

    hidden: int
    cell: str = "gru"            # "gru" | "lstm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        h = self.hidden
        n_gates = 3 if self.cell == "gru" else 4

        # Hoisted input projection: one big MXU matmul over [B*T, D].
        gates_x = nn.Dense(n_gates * h, dtype=self.dtype, name="wx")(x)
        w_h = self.param("wh", nn.initializers.orthogonal(),
                         (h, n_gates * h), jnp.float32).astype(self.dtype)
        b_h = self.param("bh", nn.initializers.zeros,
                         (n_gates * h,), jnp.float32).astype(self.dtype)

        if self.cell == "gru":
            def step(carry, gx_t):
                h_prev = carry
                gh = h_prev @ w_h + b_h
                xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h_prev
                return h_new, h_new

            carry0 = jnp.zeros((b, h), self.dtype)
        else:  # lstm
            def step(carry, gx_t):
                h_prev, c_prev = carry
                g = gx_t + h_prev @ w_h + b_h
                i, f, gc, o = jnp.split(g, 4, axis=-1)
                c_new = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gc)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            carry0 = (jnp.zeros((b, h), self.dtype), jnp.zeros((b, h), self.dtype))

        return _scan_rnn(step, gates_x, mask.astype(self.dtype), carry0)


class BiRNN(nn.Module):
    """Bidirectional GRU/LSTM, sum of directions (reference BatchRNN parity,
    SURVEY.md §2 "DeepSpeech2-style acoustic model")."""

    hidden: int
    cell: str = "gru"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        mask = time_mask(lengths, x.shape[1], x.dtype)
        fwd = _RNNDirection(self.hidden, self.cell, self.dtype, name="fwd")(x, mask)
        x_rev = jnp.flip(x, axis=1)
        mask_rev = jnp.flip(mask, axis=1)
        bwd = _RNNDirection(self.hidden, self.cell, self.dtype, name="bwd")(x_rev, mask_rev)
        bwd = jnp.flip(bwd, axis=1)
        return fwd + bwd
