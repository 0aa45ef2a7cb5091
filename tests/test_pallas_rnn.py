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
def test_forward_matches_scan(t):
    gx, m, wh, bh = _inputs(t=t)
    y_k = lstm_scan_pallas(gx, m, wh, bh, True)
    y_r = _reference_scan(gx, m, wh, bh)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=1e-5, rtol=1e-5)


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
