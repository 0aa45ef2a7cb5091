"""Fused Pallas LSTM/GRU recurrences with custom VJP.

The recurrent time loop is the framework's hot loop (SURVEY.md §3.5, §7 "BLSTM
throughput on TPU is where the target is won or lost").  XLA's `lax.scan` pays
~tens of microseconds of loop machinery per step around a sub-microsecond matmul.
These kernels run the whole recurrence inside ONE Pallas program:

- **Sequential grid** over time chunks; the recurrent state lives in VMEM scratch
  and persists across grid steps; weights stay resident in VMEM for the whole scan.
- Both directions advance together (stacked [2, B, H] state, two MXU dots per
  step), exactly like ops/rnn.py's fused scan.
- **Custom VJP**: the forward saves per-step PRE-update states; the backward kernel
  walks the grid in reverse, recomputes gate activations (one extra matmul -- the
  standard memory/compute trade) and emits per-step gate gradients.  The weight
  gradients dWh/dbh are then ONE large einsum over (saved states x gate grads)
  outside the kernel -- that is pure MXU work XLA already does optimally, and
  keeping the f32 [2,H,G*H] accumulator out of VMEM is what lets the time chunk
  stay large (the first version OOM'd scoped VMEM at 30 MB).
- The time chunk is picked per call from a VMEM budget (double-buffered streams +
  resident weights <= ~11 MB of the 16 MB/core).

Semantics match ops/rnn.py's masked scans (tests/test_pallas_rnn.py, values + VJP):
state frozen where mask==0, y[t] = mask * h_new.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024


def _sig(x):
    return jax.nn.sigmoid(x)


def _pick_chunk(b: int, h: int, gdim: int, itemsize: int, n_state_streams: int,
                n_gate_streams: int) -> int:
    """Largest chunk whose double-buffered streams + resident weights fit VMEM.

    All per-step streams (gates AND saved states / output grads) ride in the
    input dtype — bf16 in production halves the traffic and doubles the chunk.
    """
    fixed = 2 * h * gdim * itemsize + 2 * gdim * 4              # wh (stream dtype) + bh (f32)
    per_t = 2 * (n_gate_streams * 2 * b * gdim * itemsize       # gx/dgx/dgh
                 + n_state_streams * 2 * b * h * itemsize)      # states/y/dy
    for ct in (32, 16, 8, 4, 2, 1):
        if fixed + ct * per_t <= _VMEM_BUDGET:
            return ct
    return 1


def _pad_t(x, ct):
    pad = (-x.shape[0]) % ct
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x


def _seq_params():
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",))


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def _lstm_fwd_kernel(gx_ref, m_ref, wh_ref, bh_ref,
                     y_ref, hprev_ref, cprev_ref, h_st, c_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)
        c_st[:] = jnp.zeros_like(c_st)

    ct = gx_ref.shape[0]
    hdim = h_st.shape[2]

    def step(j, _):
        h = h_st[:]
        c = c_st[:]
        # Saved states stream out in the input dtype (bf16 in production):
        # the recurrence itself stays f32 in scratch; only the backward-pass
        # recompute sees the rounded copies (standard mixed-precision trade).
        hprev_ref[j] = h.astype(hprev_ref.dtype)
        cprev_ref[j] = c.astype(cprev_ref.dtype)
        gx_t = gx_ref[j].astype(jnp.float32)
        m_t = m_ref[j][..., None].astype(jnp.float32)
        # Recurrent dots ride the MXU in the stream dtype (bf16 in production
        # -> native MXU passes; f32 inputs would pay the multi-pass penalty).
        # Accumulation and the state update stay f32.
        hc = h.astype(wh_ref.dtype)
        g0 = jnp.dot(hc[0], wh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(hc[1], wh_ref[1], preferred_element_type=jnp.float32)
        g = gx_t + jnp.stack([g0, g1], axis=0) + bh_ref[:][:, None, :]
        i, f, gc, o = (g[..., :hdim], g[..., hdim:2 * hdim],
                       g[..., 2 * hdim:3 * hdim], g[..., 3 * hdim:])
        c_new = _sig(f + 1.0) * c + _sig(i) * jnp.tanh(gc)
        h_new = _sig(o) * jnp.tanh(c_new)
        y_ref[j] = (m_t * h_new).astype(y_ref.dtype)
        h_st[:] = m_t * h_new + (1.0 - m_t) * h
        c_st[:] = m_t * c_new + (1.0 - m_t) * c
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _lstm_bwd_kernel(gx_ref, m_ref, wh_ref, bh_ref, hprev_ref, cprev_ref, dy_ref,
                     dgx_ref, dh_st, dc_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_st[:] = jnp.zeros_like(dh_st)
        dc_st[:] = jnp.zeros_like(dc_st)

    ct = gx_ref.shape[0]
    hdim = dh_st.shape[2]

    def step(jj, _):
        j = ct - 1 - jj
        h_prev_c = hprev_ref[j].astype(wh_ref.dtype)
        c_prev = cprev_ref[j].astype(jnp.float32)
        gx_t = gx_ref[j].astype(jnp.float32)
        m_t = m_ref[j][..., None].astype(jnp.float32)
        dy_t = dy_ref[j].astype(jnp.float32)

        # Recompute gates (one extra matmul instead of saving activations);
        # MXU-native dtype for the dots, f32 accumulation.
        g0 = jnp.dot(h_prev_c[0], wh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(h_prev_c[1], wh_ref[1], preferred_element_type=jnp.float32)
        g = gx_t + jnp.stack([g0, g1], axis=0) + bh_ref[:][:, None, :]
        si = _sig(g[..., :hdim])
        sf = _sig(g[..., hdim:2 * hdim] + 1.0)
        tg = jnp.tanh(g[..., 2 * hdim:3 * hdim])
        so = _sig(g[..., 3 * hdim:])
        tc = jnp.tanh(sf * c_prev + si * tg)

        dh_t = dh_st[:]
        dc_t = dc_st[:]
        dh_upd = m_t * (dh_t + dy_t)
        dc_upd = m_t * dc_t
        dh_keep = (1.0 - m_t) * dh_t
        dc_keep = (1.0 - m_t) * dc_t

        do = dh_upd * tc * so * (1.0 - so)
        dc_new = dh_upd * so * (1.0 - tc * tc) + dc_upd
        df = dc_new * c_prev * sf * (1.0 - sf)
        di = dc_new * tg * si * (1.0 - si)
        dgc = dc_new * si * (1.0 - tg * tg)
        dc_prev = dc_new * sf + dc_keep

        dg = jnp.concatenate([di, df, dgc, do], axis=-1)
        dgx_ref[j] = dg.astype(dgx_ref.dtype)

        dgc_mxu = dg.astype(wh_ref.dtype)
        dh0 = jnp.dot(dgc_mxu[0], wh_ref[0].T, preferred_element_type=jnp.float32)
        dh1 = jnp.dot(dgc_mxu[1], wh_ref[1].T, preferred_element_type=jnp.float32)
        dh_st[:] = jnp.stack([dh0, dh1], axis=0) + dh_keep
        dc_st[:] = dc_prev
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _lstm_fwd_call(gx, m, wh, bh, interpret):
    t = gx.shape[0]
    b, gh4 = gx.shape[2], gx.shape[3]
    h = gh4 // 4
    ct = _pick_chunk(b, h, gh4, jnp.dtype(gx.dtype).itemsize,
                     n_state_streams=3, n_gate_streams=1)
    gx_p, m_p = _pad_t(gx, ct), _pad_t(m.astype(jnp.float32), ct)
    tp = gx_p.shape[0]

    y, hprev, cprev = pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(tp // ct,),
        in_specs=[
            pl.BlockSpec((ct, 2, b, gh4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, gh4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ct, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, 2, b, h), gx.dtype),
            jax.ShapeDtypeStruct((tp, 2, b, h), gx.dtype),
            jax.ShapeDtypeStruct((tp, 2, b, h), gx.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
        ],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gx_p, m_p, wh.astype(gx.dtype), bh.astype(jnp.float32))
    return y[:t], hprev, cprev


def _lstm_bwd_call(gx, m, wh, bh, hprev, cprev, dy, interpret):
    t = gx.shape[0]
    b, gh4 = gx.shape[2], gx.shape[3]
    h = gh4 // 4
    ct = _pick_chunk(b, h, gh4, jnp.dtype(gx.dtype).itemsize,
                     n_state_streams=3, n_gate_streams=2)
    gx_p, m_p, dy_p = (_pad_t(gx, ct), _pad_t(m.astype(jnp.float32), ct),
                       _pad_t(dy, ct))
    tp = gx_p.shape[0]
    hprev_p, cprev_p = _pad_t(hprev, ct)[:tp], _pad_t(cprev, ct)[:tp]
    nc = tp // ct
    rev4 = lambda i: (nc - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (nc - 1 - i, 0, 0)     # noqa: E731

    dgx = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ct, 2, b, gh4), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, gh4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), rev4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ct, 2, b, gh4), rev4, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 2, b, gh4), gx.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
        ],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gx_p, m_p, wh.astype(gx.dtype), bh.astype(jnp.float32),
      hprev_p, cprev_p, dy_p)
    dgx = dgx[:t]

    # Weight grads: one large einsum over saved states x gate grads (MXU, f32
    # accumulation, outside the kernel -- keeps the f32 accumulator out of
    # scoped VMEM).
    dwh = jnp.einsum("tdbh,tdbg->dhg", hprev[:t], dgx,
                     preferred_element_type=jnp.float32)
    dbh = jnp.einsum("tdbg->dg", dgx, preferred_element_type=jnp.float32)
    return dgx, dwh, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_pallas(gx: jnp.ndarray, m: jnp.ndarray, wh: jnp.ndarray,
                     bh: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Fused bidirectional LSTM recurrence.

    gx: [T, 2, B, 4H] precomputed input gates (dir 1 already time-flipped);
    m: [T, 2, B] validity mask;  wh: [2, H, 4H];  bh: [2, 4H]
    -> y: [T, 2, B, H] masked hidden outputs.
    """
    y, _, _ = _lstm_fwd_call(gx, m, wh, bh, interpret)
    return y


def _lstm_vjp_fwd(gx, m, wh, bh, interpret):
    y, hprev, cprev = _lstm_fwd_call(gx, m, wh, bh, interpret)
    return y, (gx, m, wh, bh, hprev, cprev)


def _lstm_vjp_bwd(interpret, res, dy):
    gx, m, wh, bh, hprev, cprev = res
    dgx, dwh, dbh = _lstm_bwd_call(gx, m, wh, bh, hprev, cprev, dy, interpret)
    return dgx, jnp.zeros_like(m), dwh.astype(wh.dtype), dbh.astype(bh.dtype)


lstm_scan_pallas.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)


# ---------------------------------------------------------------------------
# GRU (the acoustic model's default cell)
# ---------------------------------------------------------------------------

def _gru_fwd_kernel(gx_ref, m_ref, wh_ref, bh_ref, y_ref, hprev_ref, h_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)

    ct = gx_ref.shape[0]
    hdim = h_st.shape[2]

    def step(j, _):
        h = h_st[:]
        hprev_ref[j] = h.astype(hprev_ref.dtype)   # bf16 stream in production
        gx_t = gx_ref[j].astype(jnp.float32)
        m_t = m_ref[j][..., None].astype(jnp.float32)
        # MXU-native recurrent dots (see LSTM kernel note).
        hc = h.astype(wh_ref.dtype)
        gh0 = jnp.dot(hc[0], wh_ref[0], preferred_element_type=jnp.float32)
        gh1 = jnp.dot(hc[1], wh_ref[1], preferred_element_type=jnp.float32)
        gh = jnp.stack([gh0, gh1], axis=0) + bh_ref[:][:, None, :]
        xr, xz, xn = (gx_t[..., :hdim], gx_t[..., hdim:2 * hdim],
                      gx_t[..., 2 * hdim:])
        hr, hz, hn = (gh[..., :hdim], gh[..., hdim:2 * hdim], gh[..., 2 * hdim:])
        r = _sig(xr + hr)
        z = _sig(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        y_ref[j] = (m_t * h_new).astype(y_ref.dtype)
        h_st[:] = m_t * h_new + (1.0 - m_t) * h
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _gru_bwd_kernel(gx_ref, m_ref, wh_ref, bh_ref, hprev_ref, dy_ref,
                    dgx_ref, dgh_ref, dh_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_st[:] = jnp.zeros_like(dh_st)

    ct = gx_ref.shape[0]
    hdim = dh_st.shape[2]

    def step(jj, _):
        j = ct - 1 - jj
        h_prev_c = hprev_ref[j].astype(wh_ref.dtype)
        h_prev = h_prev_c.astype(jnp.float32)
        gx_t = gx_ref[j].astype(jnp.float32)
        m_t = m_ref[j][..., None].astype(jnp.float32)
        dy_t = dy_ref[j].astype(jnp.float32)

        gh0 = jnp.dot(h_prev_c[0], wh_ref[0], preferred_element_type=jnp.float32)
        gh1 = jnp.dot(h_prev_c[1], wh_ref[1], preferred_element_type=jnp.float32)
        gh = jnp.stack([gh0, gh1], axis=0) + bh_ref[:][:, None, :]
        xr, xz, xn = (gx_t[..., :hdim], gx_t[..., hdim:2 * hdim],
                      gx_t[..., 2 * hdim:])
        hr, hz, hn = (gh[..., :hdim], gh[..., hdim:2 * hdim], gh[..., 2 * hdim:])
        r = _sig(xr + hr)
        z = _sig(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dh_t = dh_st[:]
        dh_upd = m_t * (dh_t + dy_t)
        dh_keep = (1.0 - m_t) * dh_t

        dz_pre = dh_upd * (h_prev - n) * z * (1.0 - z)
        dn_pre = dh_upd * (1.0 - z) * (1.0 - n * n)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dhn = dn_pre * r

        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
        dgx_ref[j] = dgx.astype(dgx_ref.dtype)
        dgh_ref[j] = dgh.astype(dgh_ref.dtype)

        dghc = dgh.astype(wh_ref.dtype)
        dh0 = jnp.dot(dghc[0], wh_ref[0].T, preferred_element_type=jnp.float32)
        dh1 = jnp.dot(dghc[1], wh_ref[1].T, preferred_element_type=jnp.float32)
        dh_st[:] = jnp.stack([dh0, dh1], axis=0) + dh_upd * z + dh_keep
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _gru_fwd_call(gx, m, wh, bh, interpret):
    t = gx.shape[0]
    b, gh3 = gx.shape[2], gx.shape[3]
    h = gh3 // 3
    ct = _pick_chunk(b, h, gh3, jnp.dtype(gx.dtype).itemsize,
                     n_state_streams=2, n_gate_streams=1)
    gx_p, m_p = _pad_t(gx, ct), _pad_t(m.astype(jnp.float32), ct)
    tp = gx_p.shape[0]

    y, hprev = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(tp // ct,),
        in_specs=[
            pl.BlockSpec((ct, 2, b, gh3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, gh3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ct, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, 2, b, h), gx.dtype),
            jax.ShapeDtypeStruct((tp, 2, b, h), gx.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gx_p, m_p, wh.astype(gx.dtype), bh.astype(jnp.float32))
    return y[:t], hprev


def _gru_bwd_call(gx, m, wh, bh, hprev, dy, interpret):
    t = gx.shape[0]
    b, gh3 = gx.shape[2], gx.shape[3]
    h = gh3 // 3
    ct = _pick_chunk(b, h, gh3, jnp.dtype(gx.dtype).itemsize,
                     n_state_streams=2, n_gate_streams=3)
    gx_p, m_p, dy_p = (_pad_t(gx, ct), _pad_t(m.astype(jnp.float32), ct),
                       _pad_t(dy, ct))
    tp = gx_p.shape[0]
    hprev_p = _pad_t(hprev, ct)[:tp]
    nc = tp // ct
    rev4 = lambda i: (nc - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (nc - 1 - i, 0, 0)     # noqa: E731

    dgx, dgh = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ct, 2, b, gh3), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, gh3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, gh3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, h), rev4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ct, 2, b, gh3), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 2, b, gh3), rev4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, 2, b, gh3), gx.dtype),
            jax.ShapeDtypeStruct((tp, 2, b, gh3), gx.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gx_p, m_p, wh.astype(gx.dtype), bh.astype(jnp.float32), hprev_p, dy_p)
    dgx, dgh = dgx[:t], dgh[:t]

    dwh = jnp.einsum("tdbh,tdbg->dhg", hprev[:t], dgh,
                     preferred_element_type=jnp.float32)
    dbh = jnp.einsum("tdbg->dg", dgh, preferred_element_type=jnp.float32)
    return dgx, dwh, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan_pallas(gx: jnp.ndarray, m: jnp.ndarray, wh: jnp.ndarray,
                    bh: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Fused bidirectional GRU recurrence.

    gx: [T, 2, B, 3H];  m: [T, 2, B];  wh: [2, H, 3H];  bh: [2, 3H]
    -> y: [T, 2, B, H] masked hidden outputs.
    """
    y, _ = _gru_fwd_call(gx, m, wh, bh, interpret)
    return y


def _gru_vjp_fwd(gx, m, wh, bh, interpret):
    y, hprev = _gru_fwd_call(gx, m, wh, bh, interpret)
    return y, (gx, m, wh, bh, hprev)


def _gru_vjp_bwd(interpret, res, dy):
    gx, m, wh, bh, hprev = res
    dgx, dwh, dbh = _gru_bwd_call(gx, m, wh, bh, hprev, dy, interpret)
    return dgx, jnp.zeros_like(m), dwh.astype(wh.dtype), dbh.astype(bh.dtype)


gru_scan_pallas.defvjp(_gru_vjp_fwd, _gru_vjp_bwd)


# ---------------------------------------------------------------------------
# Time-major dual-stream interface (no host-side flips or transposes)
#
# The [T, 2, B, GH] interface above needs the caller to stack/transpose the
# Dense output and pre-flip direction 1 — ~60 ms/step of pure HBM layout
# traffic at the production batch (measured via jax.profiler, BASELINE.md).
# These variants take the gates EXACTLY as the hoisted input projection
# produces them — gxf/gxb: [T, B, GH] in natural time order — and realize the
# backward direction's time reversal in the BlockSpec index maps (direction 1
# reads block nc-1-i while direction 0 reads block i), so no flipped or
# transposed copy of the 100s-of-MB gate tensor ever exists in HBM.
# Both directions still advance together on one [2, B, H] VMEM state.
# ---------------------------------------------------------------------------


def _lstm_tm_fwd_kernel(gxf_ref, gxb_ref, mf_ref, mb_ref, wh_ref, bh_ref,
                        yf_ref, yb_ref, hpf_ref, hpb_ref, cpf_ref, cpb_ref,
                        h_st, c_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)
        c_st[:] = jnp.zeros_like(c_st)

    ct = gxf_ref.shape[0]
    hdim = h_st.shape[2]

    def step(j, _):
        jb = ct - 1 - j          # direction 1 walks its (reversed) block backwards
        h = h_st[:]
        c = c_st[:]
        hpf_ref[j] = h[0].astype(hpf_ref.dtype)
        hpb_ref[jb] = h[1].astype(hpb_ref.dtype)
        cpf_ref[j] = c[0].astype(cpf_ref.dtype)
        cpb_ref[jb] = c[1].astype(cpb_ref.dtype)
        gx_t = jnp.stack([gxf_ref[j], gxb_ref[jb]], axis=0).astype(jnp.float32)
        m_t = jnp.stack([mf_ref[j, 0], mb_ref[jb, 0]], axis=0)[..., None].astype(
            jnp.float32)
        hc = h.astype(wh_ref.dtype)
        g0 = jnp.dot(hc[0], wh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(hc[1], wh_ref[1], preferred_element_type=jnp.float32)
        g = gx_t + jnp.stack([g0, g1], axis=0) + bh_ref[:][:, None, :]
        i, f, gc, o = (g[..., :hdim], g[..., hdim:2 * hdim],
                       g[..., 2 * hdim:3 * hdim], g[..., 3 * hdim:])
        c_new = _sig(f + 1.0) * c + _sig(i) * jnp.tanh(gc)
        h_new = _sig(o) * jnp.tanh(c_new)
        y = m_t * h_new
        yf_ref[j] = y[0].astype(yf_ref.dtype)
        yb_ref[jb] = y[1].astype(yb_ref.dtype)
        h_st[:] = m_t * h_new + (1.0 - m_t) * h
        c_st[:] = m_t * c_new + (1.0 - m_t) * c
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _lstm_tm_bwd_kernel(gxf_ref, gxb_ref, mf_ref, mb_ref, wh_ref, bh_ref,
                        hpf_ref, hpb_ref, cpf_ref, cpb_ref, dyf_ref, dyb_ref,
                        dgxf_ref, dgxb_ref, dh_st, dc_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_st[:] = jnp.zeros_like(dh_st)
        dc_st[:] = jnp.zeros_like(dc_st)

    ct = gxf_ref.shape[0]
    hdim = dh_st.shape[2]

    def step(jj, _):
        # Direction 0's backward walks global time in reverse (its block refs
        # carry a reversed index map, local index descends); direction 1's
        # backward walks global time FORWARD (its own sequence reversed).
        j0 = ct - 1 - jj
        j1 = jj
        h_prev_c = jnp.stack([hpf_ref[j0], hpb_ref[j1]], axis=0).astype(
            wh_ref.dtype)
        c_prev = jnp.stack([cpf_ref[j0], cpb_ref[j1]], axis=0).astype(
            jnp.float32)
        gx_t = jnp.stack([gxf_ref[j0], gxb_ref[j1]], axis=0).astype(jnp.float32)
        m_t = jnp.stack([mf_ref[j0, 0], mb_ref[j1, 0]], axis=0)[..., None].astype(
            jnp.float32)
        dy_t = jnp.stack([dyf_ref[j0], dyb_ref[j1]], axis=0).astype(jnp.float32)

        g0 = jnp.dot(h_prev_c[0], wh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(h_prev_c[1], wh_ref[1], preferred_element_type=jnp.float32)
        g = gx_t + jnp.stack([g0, g1], axis=0) + bh_ref[:][:, None, :]
        si = _sig(g[..., :hdim])
        sf = _sig(g[..., hdim:2 * hdim] + 1.0)
        tg = jnp.tanh(g[..., 2 * hdim:3 * hdim])
        so = _sig(g[..., 3 * hdim:])
        tc = jnp.tanh(sf * c_prev + si * tg)

        dh_t = dh_st[:]
        dc_t = dc_st[:]
        dh_upd = m_t * (dh_t + dy_t)
        dc_upd = m_t * dc_t
        dh_keep = (1.0 - m_t) * dh_t
        dc_keep = (1.0 - m_t) * dc_t

        do = dh_upd * tc * so * (1.0 - so)
        dc_new = dh_upd * so * (1.0 - tc * tc) + dc_upd
        df = dc_new * c_prev * sf * (1.0 - sf)
        di = dc_new * tg * si * (1.0 - si)
        dgc = dc_new * si * (1.0 - tg * tg)
        dc_prev = dc_new * sf + dc_keep

        dg = jnp.concatenate([di, df, dgc, do], axis=-1)
        dgxf_ref[j0] = dg[0].astype(dgxf_ref.dtype)
        dgxb_ref[j1] = dg[1].astype(dgxb_ref.dtype)

        dgc_mxu = dg.astype(wh_ref.dtype)
        dh0 = jnp.dot(dgc_mxu[0], wh_ref[0].T, preferred_element_type=jnp.float32)
        dh1 = jnp.dot(dgc_mxu[1], wh_ref[1].T, preferred_element_type=jnp.float32)
        dh_st[:] = jnp.stack([dh0, dh1], axis=0) + dh_keep
        dc_st[:] = dc_prev
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _tm_specs(ct, b, width, nc, reverse):
    idx = (lambda i: (nc - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    return pl.BlockSpec((ct, b, width), idx, memory_space=pltpu.VMEM)


def _tm_mask_specs(ct, b, nc, reverse):
    # Mask rides as [T, 1, B]: the trailing (1, B) block dims satisfy the
    # Mosaic (8, 128)-divisibility rule for ANY time chunk (a [T, B] block of
    # (ct, B) would need ct % 8 == 0).
    idx = (lambda i: (nc - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    return pl.BlockSpec((ct, 1, b), idx, memory_space=pltpu.VMEM)


def _lstm_tm_fwd_call(gxf, gxb, m, wh, bh, interpret):
    t, b, gh4 = gxf.shape
    h = gh4 // 4
    ct = _pick_chunk(b, h, gh4, jnp.dtype(gxf.dtype).itemsize,
                     n_state_streams=3, n_gate_streams=1)
    gxf_p, gxb_p = _pad_t(gxf, ct), _pad_t(gxb, ct)
    m_p = _pad_t(m.astype(jnp.float32), ct)[:, None, :]      # [Tp, 1, B]
    tp = gxf_p.shape[0]
    nc = tp // ct
    wspec = pl.BlockSpec((2, h, gh4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((2, gh4), lambda i: (0, 0), memory_space=pltpu.VMEM)
    st = lambda width, rev: _tm_specs(ct, b, width, nc, rev)  # noqa: E731

    outs = pl.pallas_call(
        _lstm_tm_fwd_kernel,
        grid=(nc,),
        in_specs=[st(gh4, False), st(gh4, True),
                  _tm_mask_specs(ct, b, nc, False),
                  _tm_mask_specs(ct, b, nc, True), wspec, bspec],
        out_specs=[st(h, False), st(h, True),      # yf, yb
                   st(h, False), st(h, True),      # hpf, hpb
                   st(h, False), st(h, True)],     # cpf, cpb
        out_shape=[jax.ShapeDtypeStruct((tp, b, h), gxf.dtype)] * 6,
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32),
                        pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gxf_p, gxb_p, m_p, m_p, wh.astype(gxf.dtype), bh.astype(jnp.float32))
    yf, yb, hpf, hpb, cpf, cpb = outs
    return yf[:t], yb[:t], hpf, hpb, cpf, cpb


def _lstm_tm_bwd_call(gxf, gxb, m, wh, bh, hpf, hpb, cpf, cpb, dyf, dyb,
                      interpret):
    t, b, gh4 = gxf.shape
    h = gh4 // 4
    ct = _pick_chunk(b, h, gh4, jnp.dtype(gxf.dtype).itemsize,
                     n_state_streams=3, n_gate_streams=2)
    gxf_p, gxb_p = _pad_t(gxf, ct), _pad_t(gxb, ct)
    m_p = _pad_t(m.astype(jnp.float32), ct)[:, None, :]      # [Tp, 1, B]
    dyf_p, dyb_p = _pad_t(dyf, ct), _pad_t(dyb, ct)
    tp = gxf_p.shape[0]
    nc = tp // ct
    hpf_p, hpb_p = _pad_t(hpf, ct)[:tp], _pad_t(hpb, ct)[:tp]
    cpf_p, cpb_p = _pad_t(cpf, ct)[:tp], _pad_t(cpb, ct)[:tp]
    wspec = pl.BlockSpec((2, h, gh4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((2, gh4), lambda i: (0, 0), memory_space=pltpu.VMEM)
    st = lambda width, rev: _tm_specs(ct, b, width, nc, rev)  # noqa: E731

    # Direction 0 streams ride REVERSED index maps in the backward pass;
    # direction 1 streams ride FORWARD maps (its reversal already happened in
    # the forward pass's write order).
    dgxf, dgxb = pl.pallas_call(
        _lstm_tm_bwd_kernel,
        grid=(nc,),
        in_specs=[st(gh4, True), st(gh4, False),
                  _tm_mask_specs(ct, b, nc, True),
                  _tm_mask_specs(ct, b, nc, False), wspec, bspec,
                  st(h, True), st(h, False),       # hpf, hpb
                  st(h, True), st(h, False),       # cpf, cpb
                  st(h, True), st(h, False)],      # dyf, dyb
        out_specs=[st(gh4, True), st(gh4, False)],
        out_shape=[jax.ShapeDtypeStruct((tp, b, gh4), gxf.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32),
                        pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gxf_p, gxb_p, m_p, m_p, wh.astype(gxf.dtype), bh.astype(jnp.float32),
      hpf_p, hpb_p, cpf_p, cpb_p, dyf_p, dyb_p)
    dgxf, dgxb = dgxf[:t], dgxb[:t]

    dwh = jnp.stack([
        jnp.einsum("tbh,tbg->hg", hpf[:t], dgxf,
                   preferred_element_type=jnp.float32),
        jnp.einsum("tbh,tbg->hg", hpb[:t], dgxb,
                   preferred_element_type=jnp.float32)], axis=0)
    dbh = jnp.stack([jnp.einsum("tbg->g", dgxf,
                                preferred_element_type=jnp.float32),
                     jnp.einsum("tbg->g", dgxb,
                                preferred_element_type=jnp.float32)], axis=0)
    return dgxf, dgxb, dwh, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_scan_tm(gxf: jnp.ndarray, gxb: jnp.ndarray, m: jnp.ndarray,
                 wh: jnp.ndarray, bh: jnp.ndarray,
                 interpret: bool = False):
    """Fused bidirectional LSTM, time-major dual-stream interface.

    gxf/gxb: [T, B, 4H] input gates per direction, NATURAL time order (no
    host-side flip); m: [T, B] validity mask; wh: [2, H, 4H]; bh: [2, 4H]
    -> (yf, yb): [T, B, H] masked hidden outputs per direction, natural order
    (yb[t] is the backward direction's output at time t).
    """
    yf, yb, *_ = _lstm_tm_fwd_call(gxf, gxb, m, wh, bh, interpret)
    return yf, yb


def _lstm_tm_vjp_fwd(gxf, gxb, m, wh, bh, interpret):
    yf, yb, hpf, hpb, cpf, cpb = _lstm_tm_fwd_call(gxf, gxb, m, wh, bh,
                                                   interpret)
    return (yf, yb), (gxf, gxb, m, wh, bh, hpf, hpb, cpf, cpb)


def _lstm_tm_vjp_bwd(interpret, res, dy):
    gxf, gxb, m, wh, bh, hpf, hpb, cpf, cpb = res
    dyf, dyb = dy
    dgxf, dgxb, dwh, dbh = _lstm_tm_bwd_call(
        gxf, gxb, m, wh, bh, hpf, hpb, cpf, cpb, dyf, dyb, interpret)
    return (dgxf, dgxb, jnp.zeros_like(m), dwh.astype(wh.dtype),
            dbh.astype(bh.dtype))


lstm_scan_tm.defvjp(_lstm_tm_vjp_fwd, _lstm_tm_vjp_bwd)


def _gru_tm_fwd_kernel(gxf_ref, gxb_ref, mf_ref, mb_ref, wh_ref, bh_ref,
                       yf_ref, yb_ref, hpf_ref, hpb_ref, h_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_st[:] = jnp.zeros_like(h_st)

    ct = gxf_ref.shape[0]
    hdim = h_st.shape[2]

    def step(j, _):
        jb = ct - 1 - j
        h = h_st[:]
        hpf_ref[j] = h[0].astype(hpf_ref.dtype)
        hpb_ref[jb] = h[1].astype(hpb_ref.dtype)
        gx_t = jnp.stack([gxf_ref[j], gxb_ref[jb]], axis=0).astype(jnp.float32)
        m_t = jnp.stack([mf_ref[j, 0], mb_ref[jb, 0]], axis=0)[..., None].astype(
            jnp.float32)
        hc = h.astype(wh_ref.dtype)
        gh0 = jnp.dot(hc[0], wh_ref[0], preferred_element_type=jnp.float32)
        gh1 = jnp.dot(hc[1], wh_ref[1], preferred_element_type=jnp.float32)
        gh = jnp.stack([gh0, gh1], axis=0) + bh_ref[:][:, None, :]
        xr, xz, xn = (gx_t[..., :hdim], gx_t[..., hdim:2 * hdim],
                      gx_t[..., 2 * hdim:])
        hr, hz, hn = (gh[..., :hdim], gh[..., hdim:2 * hdim], gh[..., 2 * hdim:])
        r = _sig(xr + hr)
        z = _sig(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        y = m_t * h_new
        yf_ref[j] = y[0].astype(yf_ref.dtype)
        yb_ref[jb] = y[1].astype(yb_ref.dtype)
        h_st[:] = m_t * h_new + (1.0 - m_t) * h
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _gru_tm_bwd_kernel(gxf_ref, gxb_ref, mf_ref, mb_ref, wh_ref, bh_ref,
                       hpf_ref, hpb_ref, dyf_ref, dyb_ref,
                       dgxf_ref, dgxb_ref, dghf_ref, dghb_ref, dh_st):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_st[:] = jnp.zeros_like(dh_st)

    ct = gxf_ref.shape[0]
    hdim = dh_st.shape[2]

    def step(jj, _):
        j0 = ct - 1 - jj
        j1 = jj
        h_prev_c = jnp.stack([hpf_ref[j0], hpb_ref[j1]], axis=0).astype(
            wh_ref.dtype)
        h_prev = h_prev_c.astype(jnp.float32)
        gx_t = jnp.stack([gxf_ref[j0], gxb_ref[j1]], axis=0).astype(jnp.float32)
        m_t = jnp.stack([mf_ref[j0, 0], mb_ref[j1, 0]], axis=0)[..., None].astype(
            jnp.float32)
        dy_t = jnp.stack([dyf_ref[j0], dyb_ref[j1]], axis=0).astype(jnp.float32)

        gh0 = jnp.dot(h_prev_c[0], wh_ref[0], preferred_element_type=jnp.float32)
        gh1 = jnp.dot(h_prev_c[1], wh_ref[1], preferred_element_type=jnp.float32)
        gh = jnp.stack([gh0, gh1], axis=0) + bh_ref[:][:, None, :]
        xr, xz, xn = (gx_t[..., :hdim], gx_t[..., hdim:2 * hdim],
                      gx_t[..., 2 * hdim:])
        hr, hz, hn = (gh[..., :hdim], gh[..., hdim:2 * hdim], gh[..., 2 * hdim:])
        r = _sig(xr + hr)
        z = _sig(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dh_t = dh_st[:]
        dh_upd = m_t * (dh_t + dy_t)
        dh_keep = (1.0 - m_t) * dh_t

        dz_pre = dh_upd * (h_prev - n) * z * (1.0 - z)
        dn_pre = dh_upd * (1.0 - z) * (1.0 - n * n)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dhn = dn_pre * r

        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dgh = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
        dgxf_ref[j0] = dgx[0].astype(dgxf_ref.dtype)
        dgxb_ref[j1] = dgx[1].astype(dgxb_ref.dtype)
        dghf_ref[j0] = dgh[0].astype(dghf_ref.dtype)
        dghb_ref[j1] = dgh[1].astype(dghb_ref.dtype)

        dghc = dgh.astype(wh_ref.dtype)
        dh0 = jnp.dot(dghc[0], wh_ref[0].T, preferred_element_type=jnp.float32)
        dh1 = jnp.dot(dghc[1], wh_ref[1].T, preferred_element_type=jnp.float32)
        dh_st[:] = jnp.stack([dh0, dh1], axis=0) + dh_upd * z + dh_keep
        return 0

    jax.lax.fori_loop(0, ct, step, 0, unroll=ct)


def _gru_tm_fwd_call(gxf, gxb, m, wh, bh, interpret):
    t, b, gh3 = gxf.shape
    h = gh3 // 3
    ct = _pick_chunk(b, h, gh3, jnp.dtype(gxf.dtype).itemsize,
                     n_state_streams=2, n_gate_streams=1)
    gxf_p, gxb_p = _pad_t(gxf, ct), _pad_t(gxb, ct)
    m_p = _pad_t(m.astype(jnp.float32), ct)[:, None, :]      # [Tp, 1, B]
    tp = gxf_p.shape[0]
    nc = tp // ct
    wspec = pl.BlockSpec((2, h, gh3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((2, gh3), lambda i: (0, 0), memory_space=pltpu.VMEM)
    st = lambda width, rev: _tm_specs(ct, b, width, nc, rev)  # noqa: E731

    yf, yb, hpf, hpb = pl.pallas_call(
        _gru_tm_fwd_kernel,
        grid=(nc,),
        in_specs=[st(gh3, False), st(gh3, True),
                  _tm_mask_specs(ct, b, nc, False),
                  _tm_mask_specs(ct, b, nc, True), wspec, bspec],
        out_specs=[st(h, False), st(h, True),
                   st(h, False), st(h, True)],
        out_shape=[jax.ShapeDtypeStruct((tp, b, h), gxf.dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gxf_p, gxb_p, m_p, m_p, wh.astype(gxf.dtype), bh.astype(jnp.float32))
    return yf[:t], yb[:t], hpf, hpb


def _gru_tm_bwd_call(gxf, gxb, m, wh, bh, hpf, hpb, dyf, dyb, interpret):
    t, b, gh3 = gxf.shape
    h = gh3 // 3
    ct = _pick_chunk(b, h, gh3, jnp.dtype(gxf.dtype).itemsize,
                     n_state_streams=2, n_gate_streams=3)
    gxf_p, gxb_p = _pad_t(gxf, ct), _pad_t(gxb, ct)
    m_p = _pad_t(m.astype(jnp.float32), ct)[:, None, :]      # [Tp, 1, B]
    dyf_p, dyb_p = _pad_t(dyf, ct), _pad_t(dyb, ct)
    tp = gxf_p.shape[0]
    nc = tp // ct
    hpf_p, hpb_p = _pad_t(hpf, ct)[:tp], _pad_t(hpb, ct)[:tp]
    wspec = pl.BlockSpec((2, h, gh3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((2, gh3), lambda i: (0, 0), memory_space=pltpu.VMEM)
    st = lambda width, rev: _tm_specs(ct, b, width, nc, rev)  # noqa: E731

    dgxf, dgxb, dghf, dghb = pl.pallas_call(
        _gru_tm_bwd_kernel,
        grid=(nc,),
        in_specs=[st(gh3, True), st(gh3, False),
                  _tm_mask_specs(ct, b, nc, True),
                  _tm_mask_specs(ct, b, nc, False), wspec, bspec,
                  st(h, True), st(h, False),
                  st(h, True), st(h, False)],
        out_specs=[st(gh3, True), st(gh3, False),
                   st(gh3, True), st(gh3, False)],
        out_shape=[jax.ShapeDtypeStruct((tp, b, gh3), gxf.dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=_seq_params(),
        interpret=interpret,
    )(gxf_p, gxb_p, m_p, m_p, wh.astype(gxf.dtype), bh.astype(jnp.float32),
      hpf_p, hpb_p, dyf_p, dyb_p)
    dgxf, dgxb, dghf, dghb = dgxf[:t], dgxb[:t], dghf[:t], dghb[:t]

    dwh = jnp.stack([
        jnp.einsum("tbh,tbg->hg", hpf[:t], dghf,
                   preferred_element_type=jnp.float32),
        jnp.einsum("tbh,tbg->hg", hpb[:t], dghb,
                   preferred_element_type=jnp.float32)], axis=0)
    dbh = jnp.stack([jnp.einsum("tbg->g", dghf,
                                preferred_element_type=jnp.float32),
                     jnp.einsum("tbg->g", dghb,
                                preferred_element_type=jnp.float32)], axis=0)
    return dgxf, dgxb, dwh, dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_scan_tm(gxf: jnp.ndarray, gxb: jnp.ndarray, m: jnp.ndarray,
                wh: jnp.ndarray, bh: jnp.ndarray,
                interpret: bool = False):
    """Fused bidirectional GRU, time-major dual-stream interface.

    gxf/gxb: [T, B, 3H] natural time order; m: [T, B]; wh: [2, H, 3H];
    bh: [2, 3H] -> (yf, yb): [T, B, H] per-direction masked outputs.
    """
    yf, yb, *_ = _gru_tm_fwd_call(gxf, gxb, m, wh, bh, interpret)
    return yf, yb


def _gru_tm_vjp_fwd(gxf, gxb, m, wh, bh, interpret):
    yf, yb, hpf, hpb = _gru_tm_fwd_call(gxf, gxb, m, wh, bh, interpret)
    return (yf, yb), (gxf, gxb, m, wh, bh, hpf, hpb)


def _gru_tm_vjp_bwd(interpret, res, dy):
    gxf, gxb, m, wh, bh, hpf, hpb = res
    dyf, dyb = dy
    dgxf, dgxb, dwh, dbh = _gru_tm_bwd_call(gxf, gxb, m, wh, bh, hpf, hpb,
                                            dyf, dyb, interpret)
    return (dgxf, dgxb, jnp.zeros_like(m), dwh.astype(wh.dtype),
            dbh.astype(bh.dtype))


gru_scan_tm.defvjp(_gru_tm_vjp_fwd, _gru_tm_vjp_bwd)
