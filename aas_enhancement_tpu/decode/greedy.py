"""Greedy CTC decoding, jittable on-device.

Reference parity: `GreedyDecoder` — argmax, collapse repeats, drop blanks
(SURVEY.md §2 "Greedy decoder + WER").  The device side emits a dense [B, T] id
matrix plus counts; string materialization happens on host (labels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.labels import LABELS, BLANK_ID


@functools.partial(jax.jit, static_argnames=("blank_id",))
def greedy_decode(logits: jnp.ndarray, logit_paddings: jnp.ndarray,
                  blank_id: int = BLANK_ID) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, V] logits -> (ids [B, T] left-packed with -1 padding, counts [B]).

    Collapse rule: keep position t iff argmax[t] != blank and argmax[t] != argmax[t-1],
    over non-padded frames only.
    """
    am = jnp.argmax(logits, axis=-1)                           # [B, T]
    valid = logit_paddings < 0.5
    prev = jnp.pad(am[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = valid & (am != blank_id) & (am != prev)

    # Left-pack kept ids: position = cumsum(keep) - 1.
    t = am.shape[1]
    dest = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1      # [B, T]
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)

    out = jnp.full_like(am, -1)

    def pack_row(row_out, row_dest, row_am, row_keep):
        # Non-kept entries scatter out of range (index t) and drop.
        idx = jnp.where(row_keep, row_dest, t)
        return row_out.at[idx].set(row_am, mode="drop")

    out = jax.vmap(pack_row)(out, dest, am, keep)
    return out, counts


def ids_to_strings(ids: np.ndarray, counts: np.ndarray,
                   labels: str = LABELS) -> list[str]:
    out = []
    for row, n in zip(np.asarray(ids), np.asarray(counts)):
        out.append("".join(labels[int(i)] for i in row[: int(n)] if int(i) >= 0))
    return out


def decode_batch(logits, logit_paddings, labels: str = LABELS) -> list[str]:
    ids, counts = greedy_decode(logits, logit_paddings)
    return ids_to_strings(np.asarray(ids), np.asarray(counts), labels)
