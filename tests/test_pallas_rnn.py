"""Fused Pallas LSTM recurrence vs the XLA lax.scan reference (values + VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.ops.pallas.rnn_kernel import lstm_scan_pallas


def _reference_scan(gx, m, wh, bh):
    """Same math as ops/rnn.py's fused LSTM scan."""
    t, _, b, gh4 = gx.shape
    h = gh4 // 4

    def step(carry, inp):
        gx_t, m_t = inp
        h_prev, c_prev = carry
        gh = jnp.einsum("dbh,dhg->dbg", h_prev, wh) + bh[:, None, :]
        g = gx_t + gh
        i, f, gc, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gc)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        mm = m_t[..., None]
        h_out = mm * h_new + (1.0 - mm) * h_prev
        c_out = mm * c_new + (1.0 - mm) * c_prev
        return (h_out, c_out), mm * h_new

    carry0 = (jnp.zeros((2, b, h)), jnp.zeros((2, b, h)))
    _, ys = jax.lax.scan(step, carry0, (gx, m))
    return ys


def _inputs(t=21, b=4, h=8, seed=0, frac_padded=0.3):
    rng = np.random.default_rng(seed)
    gx = jnp.asarray(rng.standard_normal((t, 2, b, 4 * h)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.standard_normal((2, h, 4 * h)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.standard_normal((2, 4 * h)).astype(np.float32) * 0.1)
    lengths = rng.integers(int(t * (1 - frac_padded)), t + 1, size=(2, b))
    m = (np.arange(t)[:, None, None] < lengths[None]).astype(np.float32)
    return gx, jnp.asarray(m), wh, bh


@pytest.mark.parametrize("t", [16, 21, 40])
@pytest.mark.slow
def test_forward_matches_scan(t):
    gx, m, wh, bh = _inputs(t=t)
    y_k = lstm_scan_pallas(gx, m, wh, bh, True)
    y_r = _reference_scan(gx, m, wh, bh)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_vjp_matches_scan():
    gx, m, wh, bh = _inputs(t=24, seed=3)
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.standard_normal((24, 2, 4, 8)).astype(np.float32))

    def loss_k(gx, wh, bh):
        return jnp.sum(lstm_scan_pallas(gx, m, wh, bh, True) * cot)

    def loss_r(gx, wh, bh):
        return jnp.sum(_reference_scan(gx, m, wh, bh) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(gx, wh, bh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(gx, wh, bh)
    for a, b_, name in zip(gk, gr, ["dgx", "dwh", "dbh"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


@pytest.mark.slow
def test_all_padded_tail_stays_zero():
    gx, m, wh, bh = _inputs(t=20, frac_padded=0.5)
    y = lstm_scan_pallas(gx, m, wh, bh, True)
    np.testing.assert_array_equal(np.asarray(y) * (1 - np.asarray(m)[..., None]), 0.0)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------

from aas_enhancement_tpu.ops.pallas.rnn_kernel import gru_scan_pallas  # noqa: E402


def _reference_gru(gx, m, wh, bh):
    """Same math as ops/rnn.py's fused GRU scan."""
    t, _, b, gh3 = gx.shape
    h = gh3 // 3

    def step(carry, inp):
        gx_t, m_t = inp
        h_prev = carry
        gh = jnp.einsum("dbh,dhg->dbg", h_prev, wh) + bh[:, None, :]
        xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h_prev
        mm = m_t[..., None]
        h_out = mm * h_new + (1.0 - mm) * h_prev
        return h_out, mm * h_new

    _, ys = jax.lax.scan(step, jnp.zeros((2, b, h)), (gx, m))
    return ys


def _gru_inputs(t=21, b=4, h=8, seed=1, frac_padded=0.3):
    rng = np.random.default_rng(seed)
    gx = jnp.asarray(rng.standard_normal((t, 2, b, 3 * h)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.standard_normal((2, h, 3 * h)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.standard_normal((2, 3 * h)).astype(np.float32) * 0.1)
    lengths = rng.integers(int(t * (1 - frac_padded)), t + 1, size=(2, b))
    m = (np.arange(t)[:, None, None] < lengths[None]).astype(np.float32)
    return gx, jnp.asarray(m), wh, bh


@pytest.mark.parametrize("t", [16, 21, 40])
def test_gru_forward_matches_scan(t):
    gx, m, wh, bh = _gru_inputs(t=t)
    y_k = gru_scan_pallas(gx, m, wh, bh, True)
    y_r = _reference_gru(gx, m, wh, bh)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_gru_vjp_matches_scan():
    gx, m, wh, bh = _gru_inputs(t=24, seed=5)
    rng = np.random.default_rng(11)
    cot = jnp.asarray(rng.standard_normal((24, 2, 4, 8)).astype(np.float32))

    gk = jax.grad(lambda g_, w_, b_: jnp.sum(gru_scan_pallas(g_, m, w_, b_, True) * cot),
                  argnums=(0, 1, 2))(gx, wh, bh)
    gr = jax.grad(lambda g_, w_, b_: jnp.sum(_reference_gru(g_, m, w_, b_) * cot),
                  argnums=(0, 1, 2))(gx, wh, bh)
    for a, b_, name in zip(gk, gr, ["dgx", "dwh", "dbh"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


# ---------------------------------------------------------------------------
# Time-major dual-stream interface (direction-1 reversal via index maps)
# ---------------------------------------------------------------------------

from aas_enhancement_tpu.ops.pallas.rnn_kernel import (  # noqa: E402
    gru_scan_tm, lstm_scan_tm)


def _tm_inputs(t, b, h, g, seed=0, frac_padded=0.3):
    rng = np.random.default_rng(seed)
    gxf = jnp.asarray(rng.standard_normal((t, b, g * h)).astype(np.float32) * 0.5)
    gxb = jnp.asarray(rng.standard_normal((t, b, g * h)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.standard_normal((2, h, g * h)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.standard_normal((2, g * h)).astype(np.float32) * 0.1)
    lengths = rng.integers(int(t * (1 - frac_padded)), t + 1, size=(b,))
    m = jnp.asarray((np.arange(t)[:, None] < lengths[None]).astype(np.float32))
    return gxf, gxb, m, wh, bh


@pytest.mark.parametrize("cell,g", [("lstm", 4), ("gru", 3)])
@pytest.mark.parametrize("t", [16, 21, 40])
@pytest.mark.slow
def test_tm_matches_stacked_interface(cell, g, t):
    """tm(gxf, gxb, m) == stacked([gxf, flip(gxb)], [m, flip(m)]) with the
    outputs un-flipped — i.e. the index-map reversal is exactly the host-side
    flip it replaces."""
    gxf, gxb, m, wh, bh = _tm_inputs(t, 4, 8, g)
    old = lstm_scan_pallas if cell == "lstm" else gru_scan_pallas
    tm = lstm_scan_tm if cell == "lstm" else gru_scan_tm
    gx_old = jnp.stack([gxf, jnp.flip(gxb, axis=0)], axis=1)
    m_old = jnp.stack([m, jnp.flip(m, axis=0)], axis=1)
    y_old = old(gx_old, m_old, wh, bh, True)
    yf, yb = tm(gxf, gxb, m, wh, bh, True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y_old[:, 0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yb),
                               np.asarray(jnp.flip(y_old[:, 1], axis=0)),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("cell,g", [("lstm", 4), ("gru", 3)])
@pytest.mark.slow
def test_tm_vjp_matches_stacked_interface(cell, g):
    gxf, gxb, m, wh, bh = _tm_inputs(24, 4, 8, g, seed=7)
    old = lstm_scan_pallas if cell == "lstm" else gru_scan_pallas
    tm = lstm_scan_tm if cell == "lstm" else gru_scan_tm
    rng = np.random.default_rng(13)
    cf = jnp.asarray(rng.standard_normal((24, 4, 8)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((24, 4, 8)).astype(np.float32))
    m_old = jnp.stack([m, jnp.flip(m, axis=0)], axis=1)

    def loss_tm(gxf, gxb, wh, bh):
        yf, yb = tm(gxf, gxb, m, wh, bh, True)
        return jnp.sum(yf * cf) + jnp.sum(yb * cb)

    def loss_old(gxf, gxb, wh, bh):
        gx = jnp.stack([gxf, jnp.flip(gxb, axis=0)], axis=1)
        y = old(gx, m_old, wh, bh, True)
        return jnp.sum(y[:, 0] * cf) + jnp.sum(jnp.flip(y[:, 1], axis=0) * cb)

    g_tm = jax.grad(loss_tm, argnums=(0, 1, 2, 3))(gxf, gxb, wh, bh)
    g_old = jax.grad(loss_old, argnums=(0, 1, 2, 3))(gxf, gxb, wh, bh)
    for a, b_, name in zip(g_tm, g_old, ["dgxf", "dgxb", "dwh", "dbh"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


@pytest.mark.slow
def test_birnn_time_major_matches_batch_major():
    """BiRNN(time_major=True) on x.T == BiRNN on x (same params), both impls."""
    from aas_enhancement_tpu.ops.rnn import BiRNN

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 19, 12)).astype(np.float32))
    lengths = jnp.asarray([19, 15, 11, 7], jnp.int32)
    for cell in ("gru", "lstm"):
        bm = BiRNN(8, cell=cell, impl="xla")
        params = bm.init(jax.random.key(0), x, lengths)
        y_bm = bm.apply(params, x, lengths)
        tmod = BiRNN(8, cell=cell, impl="xla", time_major=True)
        y_tm = tmod.apply(params, jnp.transpose(x, (1, 0, 2)), lengths)
        np.testing.assert_allclose(np.asarray(jnp.transpose(y_tm, (1, 0, 2))),
                                   np.asarray(y_bm), atol=1e-5, rtol=1e-5)
        tp = BiRNN(8, cell=cell, impl="pallas", time_major=True)
        y_tp = tp.apply(params, jnp.transpose(x, (1, 0, 2)), lengths)
        np.testing.assert_allclose(np.asarray(jnp.transpose(y_tp, (1, 0, 2))),
                                   np.asarray(y_bm), atol=1e-5, rtol=1e-5)
