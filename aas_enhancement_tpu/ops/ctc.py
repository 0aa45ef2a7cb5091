"""CTC loss: log-space forward (alpha) recursion as a jittable `lax.scan`.

This is the TPU-native equivalent of the reference's warp-ctc C++/CUDA dependency
(SURVEY.md §2 "NATIVE: warp-ctc" and rebuild obligation #1): on TPU the natural
"native kernel" is an XLA-compiled scan — the per-step work is a batched gather plus
elementwise log-sum-exp on the VPU, and gradients come from autodiff through the scan
(the standard alpha-beta gradient identity is exactly what reverse-mode AD of the
forward recursion computes).

API mirrors optax.ctc_loss (the in-env correctness oracle, see tests/test_ctc.py):
  ctc_loss(logits [B,T,V], logit_paddings [B,T], labels [B,U], label_paddings [B,U])
    -> per-example negative log likelihood [B]
with blank id 0 (reference convention, labels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _logsumexp3(a, b, c):
    # All inputs are finite (unreachable states carry _NEG_INF, not -inf), so the
    # max-shifted form is NaN-free in both value and gradient.
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _shift_right(x, fill=_NEG_INF, n=1):
    pad = jnp.full(x.shape[:-1] + (n,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-n]], axis=-1)


def ctc_loss(logits: jnp.ndarray, logit_paddings: jnp.ndarray,
             labels: jnp.ndarray, label_paddings: jnp.ndarray,
             blank_id: int = 0) -> jnp.ndarray:
    """Per-example CTC negative log likelihood.

    logits: [B, T, V] unnormalized; logit_paddings: [B, T] (1.0 = padded frame);
    labels: [B, U] int ids (padded entries arbitrary); label_paddings: [B, U].
    """
    b, t, v = logits.shape
    u = labels.shape[1]
    s = 2 * u + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # Extended label sequence z: [blank, l1, blank, l2, ..., lU, blank], [B, S].
    labels = labels.astype(jnp.int32)
    z = jnp.full((b, s), blank_id, jnp.int32)
    z = z.at[:, 1::2].set(labels)

    label_lens = jnp.sum(1.0 - label_paddings, axis=1).astype(jnp.int32)  # [B]
    s_valid = 2 * label_lens + 1                                          # [B]
    pos = jnp.arange(s)[None, :]
    z_mask = pos < s_valid[:, None]                                       # [B, S]

    # Positions where the skip (s-2) transition is allowed:
    # z_s is not blank AND z_s != z_{s-2}.
    z_prev2 = _shift_right(z.astype(jnp.float32), fill=-1.0, n=2).astype(jnp.int32)
    can_skip = (z != blank_id) & (z != z_prev2) & (pos >= 2)

    # Per-step log-probs of the extended labels.  A take_along_axis gather on the
    # minor dimension lowers to a pathological per-element loop on TPU (~8x the
    # whole loss); a one-hot batched matmul runs on the MXU instead.
    z_onehot = jax.nn.one_hot(z, v, dtype=jnp.float32)                    # [B, S, V]
    lp_seq = jnp.einsum("btv,bsv->bts", log_probs, z_onehot)              # [B, T, S]

    # alpha_0: only s=0 (blank) and s=1 (first label) are reachable.
    lp0 = lp_seq[:, 0, :]                                                 # [B, S]
    alpha0 = jnp.where(pos == 0, lp0, _NEG_INF)
    alpha0 = jnp.where((pos == 1) & (s_valid[:, None] > 1), lp0, alpha0)
    alpha0 = jnp.where(z_mask, alpha0, _NEG_INF)

    lp_seq = jnp.swapaxes(lp_seq, 0, 1)                                   # [T, B, S]
    pad_seq = jnp.swapaxes(logit_paddings.astype(jnp.float32), 0, 1)      # [T, B]

    def step(alpha, inp):
        lp_t, pad_t = inp
        stay = alpha
        diag = _shift_right(alpha, n=1)
        skip = jnp.where(can_skip, _shift_right(alpha, n=2), _NEG_INF)
        new = _logsumexp3(stay, diag, skip) + lp_t
        new = jnp.where(z_mask, new, _NEG_INF)
        # Frozen at padded frames.
        new = jnp.where(pad_t[:, None] > 0, alpha, new)
        return new, None

    # unroll=8: the per-step work (a [B,S] gather + log-sum-exp) is tiny, so loop
    # iteration overhead dominates an un-unrolled scan on TPU.
    alpha_final, _ = jax.lax.scan(step, alpha0, (lp_seq[1:], pad_seq[1:]), unroll=8)
    # If T == 1, alpha0 is final.
    alpha_final = jnp.where(t > 1, alpha_final, alpha0)

    # Loss = -logsumexp(alpha[S-1], alpha[S-2]) at each sample's valid S.
    idx_last = jnp.maximum(s_valid - 1, 0)
    idx_prev = jnp.maximum(s_valid - 2, 0)
    a_last = jnp.take_along_axis(alpha_final, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha_final, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(s_valid >= 2, a_prev, _NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll


def ctc_loss_mean(logits, logit_paddings, labels, label_paddings,
                  blank_id: int = 0, weights=None, denom=None) -> jnp.ndarray:
    """Batch-mean CTC loss (the training objective scalar).

    weights: optional [B] per-example weights (0 for repeat-padded batch rows so
    they carry no gradient).
    denom: optional fixed denominator replacing sum(weights) — used by gradient
    accumulation so unevenly-filled microbatches weight exactly like the
    unaccumulated batch (train/steps.py)."""
    per_ex = ctc_loss(logits, logit_paddings, labels, label_paddings, blank_id)
    if weights is None and denom is None:
        return jnp.mean(per_ex)
    w = (jnp.ones((per_ex.shape[0],), per_ex.dtype) if weights is None
         else weights.astype(per_ex.dtype))
    d = jnp.sum(w) if denom is None else jnp.asarray(denom, per_ex.dtype)
    return jnp.sum(per_ex * w) / jnp.maximum(d, 1e-6)
