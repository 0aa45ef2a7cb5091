"""TPU-native batched CTC prefix beam search (one jitted XLA program).

Reference parity: the reference evaluated with the host-side `ctcdecode` C++
beam decoder (SURVEY.md §2 "NATIVE: ctcdecode"; rebuild obligation #3
explicitly offers "or a jittable beam search").  The C++ rebuild
(native/ctc_beam) is algorithmically faithful but inherits the reference's
host-architecture bottleneck: on a 1-core serving host it decodes ~36 utts/s
at the beam-32 hybrid production point while the chip enhances at 6675x
real-time (decode_bench_r4.json) — bulk eval is DECODE-bound.  This module
decodes a whole batch on the accelerator instead: B utterances x W beams
advance in lockstep inside one `lax.scan`, so eval rides the chip the
features already live on and the host stays free (VERDICT r4 #3).

Algorithm = the same prefix beam search as decode/beam.py (stay/extend
probability algebra identical), made fixed-shape:

- Beams are a fixed width-W tensor; dead slots carry -inf scores and
  per-slot sentinel hashes.
- A step's candidate set is the dense [W, V] grid: column `blank` is the
  "stay" candidate (same prefix: blank path + repeat-last path), every other
  column is "extend prefix with c" (from p_b when c == last, else total).
- PREFIX MERGING (the dict in the python/C++ decoders) runs on device: each
  beam carries two independent 32-bit rolling hashes of its prefix; two
  candidates are the same prefix iff both hashes agree (collision odds
  ~2^-64 per pair).  Candidates are lexsorted by hash pair, equal runs are
  logsumexp-merged with a segmented `lax.associative_scan`, and each run's
  last element survives as the representative — then `lax.top_k` keeps W.
- Char n-gram fusion is a dense-table row GATHER: each beam carries its
  base-V context index (decode/lm.py::context_index semantics, blank-padded
  on the left), updated in O(1) per extension.  Word/hybrid fusion stays
  host-side (beam.py) — word boundaries need the sparse store's hash walk,
  which earns nothing on-device at eval batch sizes.

Parity: ids match beam_search_python exactly on non-degenerate inputs
(tests/test_device_beam.py); scores agree to float32 rounding (this decoder
accumulates in f32 like the C++ one, python in f64).  Near-exact ties can
order differently across backends — same caveat as C++ vs python.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.labels import BLANK_ID, LABELS

NEG = -jnp.inf


def _mix1(h, c):
    """Rolling hash chain 1: h' = finalize(h ^ (c+1)) in uint32."""
    x = (h ^ (c.astype(jnp.uint32) + jnp.uint32(1))) * jnp.uint32(0x9E3779B1)
    x = (x ^ (x >> 15)) * jnp.uint32(0x85EBCA6B)
    return x ^ (x >> 13)


def _mix2(h, c):
    """Independent chain 2 (different constants — pair acts as a 64-bit key)."""
    x = (h ^ (c.astype(jnp.uint32) + jnp.uint32(0x61C88647))) \
        * jnp.uint32(0xC2B2AE35)
    x = (x ^ (x >> 16)) * jnp.uint32(0x27D4EB2F)
    return x ^ (x >> 11)


def _slot_sentinels(w):
    """Distinct per-slot hash pairs for dead beams (never merge with live
    prefixes: live hashes start from the slot-0 constants and only evolve
    through _mix1/_mix2)."""
    i = jnp.arange(w, dtype=jnp.uint32) + jnp.uint32(1)
    return i * jnp.uint32(0x51ED2701), i * jnp.uint32(0x6A09E667)


def _seg_lse(flags, vals):
    """Segmented inclusive logsumexp scan: each segment (runs delimited by
    flags=True at the first element) accumulates left-to-right; the LAST
    element of a segment holds the full segment reduction."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.logaddexp(va, vb))

    _, out = jax.lax.associative_scan(op, (flags, vals))
    return out


@functools.lru_cache(maxsize=32)
def _build(t_max: int, v: int, beam_width: int, blank: int, prune_k: int,
           use_lm: bool, n_ctx: int):
    """Compile-cached jitted decoder for one static shape bundle.

    -> fn(log_probs [B,T,V] f32, lengths [B] i32, lm_table [n_ctx,V] f32,
          alpha f32, beta f32) -> (ids [B,t_max] i32, out_lens [B] i32,
          scores [B] f32)
    """
    w = beam_width
    k = w * v
    sent1, sent2 = _slot_sentinels(w)
    iota_t = jnp.arange(t_max, dtype=jnp.int32)
    csym = jnp.arange(v, dtype=jnp.int32)
    is_blank_col = csym == blank

    def make_step(length, lm_table, alpha, beta):
      def step(carry, xs):
        pb, pnb, h1, h2, last, ctx, lens, pref = carry
        lp, t = xs

        total = jnp.logaddexp(pb, pnb)                       # [W]
        if 0 < prune_k < v:
            thresh = jax.lax.top_k(lp, prune_k)[0][-1]
            pmask = lp >= thresh                             # [V]
        else:
            pmask = jnp.ones((v,), bool)

        if use_lm:
            bon = alpha * lm_table[ctx] + beta               # [W, V]
        else:
            bon = jnp.zeros((w, v), jnp.float32)

        is_rep = csym[None, :] == last[:, None]              # [W, V]
        ext_base = jnp.where(is_rep, pb[:, None], total[:, None])
        pnb_ext = ext_base + lp[None, :] + bon
        pnb_ext = jnp.where(is_blank_col[None, :] | ~pmask[None, :],
                            NEG, pnb_ext)
        last_c = jnp.clip(last, 0)
        rep_ok = (last >= 0) & pmask[last_c]
        pnb_stay = jnp.where(rep_ok, pnb + lp[last_c], NEG)  # [W]
        pb_stay = total + lp[blank]
        pb_cand = jnp.where(is_blank_col[None, :], pb_stay[:, None], NEG)
        pnb_cand = jnp.where(is_blank_col[None, :], pnb_stay[:, None],
                             pnb_ext)
        h1_cand = jnp.where(is_blank_col[None, :], h1[:, None],
                            _mix1(h1[:, None], csym[None, :]))
        h2_cand = jnp.where(is_blank_col[None, :], h2[:, None],
                            _mix2(h2[:, None], csym[None, :]))

        # Merge equal prefixes across the flattened candidate grid.
        h1f, h2f = h1_cand.reshape(k), h2_cand.reshape(k)
        order = jnp.lexsort((h2f, h1f))
        sh1, sh2 = h1f[order], h2f[order]
        spb = pb_cand.reshape(k)[order]
        spnb = pnb_cand.reshape(k)[order]
        boundary = jnp.concatenate([
            jnp.ones((1,), bool),
            (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])])
        seg_pb = _seg_lse(boundary, spb)
        seg_pnb = _seg_lse(boundary, spnb)
        rep = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
        tot = jnp.where(rep, jnp.logaddexp(seg_pb, seg_pnb), NEG)

        vals, idx = jax.lax.top_k(tot, w)
        orig = order[idx]
        src, sym = orig // v, orig % v
        is_ext = sym != blank
        n_pb, n_pnb = seg_pb[idx], seg_pnb[idx]
        h1s, h2s = h1[src], h2[src]
        n_h1 = jnp.where(is_ext, _mix1(h1s, sym), h1s)
        n_h2 = jnp.where(is_ext, _mix2(h2s, sym), h2s)
        n_last = jnp.where(is_ext, sym, last[src])
        n_ctx_v = jnp.where(is_ext, (ctx[src] * v + sym) % n_ctx, ctx[src])
        src_len = lens[src]
        n_len = src_len + is_ext.astype(jnp.int32)
        n_pref = jnp.where(
            is_ext[:, None] & (iota_t[None, :] == src_len[:, None]),
            sym[:, None], pref[src])

        # Dead slots (nothing reached them): per-slot sentinel identity.
        dead = jnp.isneginf(vals)
        n_h1 = jnp.where(dead, sent1, n_h1)
        n_h2 = jnp.where(dead, sent2, n_h2)
        n_last = jnp.where(dead, -1, n_last)
        n_ctx_v = jnp.where(dead, 0, n_ctx_v)
        n_len = jnp.where(dead, 0, n_len)

        # Frames past the utterance's true length are identity.
        live = t < length
        new = (jnp.where(live, n_pb, pb), jnp.where(live, n_pnb, pnb),
               jnp.where(live, n_h1, h1), jnp.where(live, n_h2, h2),
               jnp.where(live, n_last, last), jnp.where(live, n_ctx_v, ctx),
               jnp.where(live, n_len, lens),
               jnp.where(live, n_pref, pref))
        return new, None

      return step

    def decode_one(lp_seq, length, lm_table, alpha, beta):
        pb0 = jnp.full((w,), NEG, jnp.float32).at[0].set(0.0)
        pnb0 = jnp.full((w,), NEG, jnp.float32)
        h1_0 = sent1.at[0].set(jnp.uint32(0x243F6A88))
        h2_0 = sent2.at[0].set(jnp.uint32(0x85A308D3))
        last0 = jnp.full((w,), -1, jnp.int32)
        ctx0 = jnp.zeros((w,), jnp.int32)
        lens0 = jnp.zeros((w,), jnp.int32)
        pref0 = jnp.zeros((w, t_max), jnp.int32)
        carry = (pb0, pnb0, h1_0, h2_0, last0, ctx0, lens0, pref0)
        (pb, pnb, _, _, _, _, lens, pref), _ = jax.lax.scan(
            make_step(length, lm_table, alpha, beta), carry,
            (lp_seq, iota_t))
        total = jnp.logaddexp(pb, pnb)
        best = jnp.argmax(total)
        return pref[best], lens[best], total[best]

    def decode_batch_fn(log_probs, lengths, lm_table, alpha, beta):
        return jax.vmap(decode_one, in_axes=(0, 0, None, None, None))(
            log_probs, lengths, lm_table, alpha, beta)

    return jax.jit(decode_batch_fn)


def device_beam_decode(log_probs, lengths=None, beam_width: int = 32,
                       blank: int = BLANK_ID, prune_k: int = 16,
                       lm_table: np.ndarray | None = None, lm_order: int = 0,
                       lm_alpha: float = 0.0, lm_beta: float = 0.0,
                       labels: str = LABELS) -> list[str]:
    """Batch [B, T, V] log-probs (+ valid lengths) -> decoded strings, on
    the accelerator.  Char-LM fusion only (`lm_table` = dense
    [V^(order-1), V] table, decode/lm.py::CharNGramLM.dense_table); for
    word/hybrid fusion use the host decoders (decode/beam.py)."""
    lp = jnp.asarray(log_probs, jnp.float32)
    if lp.ndim == 2:
        lp = lp[None]
    b, t, v = lp.shape
    lens = (jnp.asarray(lengths, jnp.int32) if lengths is not None
            else jnp.full((b,), t, jnp.int32))
    use_lm = lm_table is not None and lm_alpha != 0.0
    if use_lm:
        table = jnp.asarray(lm_table, jnp.float32).reshape(-1, v)
        n_ctx = int(table.shape[0])
        if n_ctx != v ** max(lm_order - 1, 0):
            raise ValueError(f"LM table has {n_ctx} contexts, expected "
                             f"{v}^{lm_order - 1} for vocab {v}")
    else:
        table, n_ctx = jnp.zeros((1, v), jnp.float32), 1
    fn = _build(t, v, beam_width, blank, prune_k, use_lm, n_ctx)
    ids, out_lens, _ = fn(lp, lens, table,
                          jnp.float32(lm_alpha), jnp.float32(lm_beta))
    ids = np.asarray(ids)
    out_lens = np.asarray(out_lens)
    return ["".join(labels[i] for i in ids[r, : out_lens[r]])
            for r in range(b)]


def device_beam_decode_raw(log_probs, lengths=None, beam_width: int = 32,
                           blank: int = BLANK_ID, prune_k: int = 16,
                           lm_table=None, lm_order: int = 0,
                           lm_alpha: float = 0.0, lm_beta: float = 0.0):
    """Like device_beam_decode but returns (ids [B,T], lens [B], scores [B])
    numpy arrays — the parity-test / benchmarking interface."""
    lp = jnp.asarray(log_probs, jnp.float32)
    if lp.ndim == 2:
        lp = lp[None]
    b, t, v = lp.shape
    lens = (jnp.asarray(lengths, jnp.int32) if lengths is not None
            else jnp.full((b,), t, jnp.int32))
    use_lm = lm_table is not None and lm_alpha != 0.0
    if use_lm:
        table = jnp.asarray(lm_table, jnp.float32).reshape(-1, v)
        n_ctx = int(table.shape[0])
    else:
        table, n_ctx = jnp.zeros((1, v), jnp.float32), 1
    fn = _build(t, v, beam_width, blank, prune_k, use_lm, n_ctx)
    ids, out_lens, scores = fn(lp, lens, table,
                               jnp.float32(lm_alpha), jnp.float32(lm_beta))
    return np.asarray(ids), np.asarray(out_lens), np.asarray(scores)
