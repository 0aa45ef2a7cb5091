"""Tap-packed conv-dW Pallas kernel vs XLA's native conv VJP.

The kernel reformulates dW as one tap-packed matmul (ops/pallas/conv_dw_kernel
docstring); these tests pin it to XLA's conv weight gradient in f32 interpret
mode on every supported shape class: stride (1,1), stride (1,2) via the phase
split, kernel (1,1), non-divisible T-tiles, and the production tap geometries.
TapDWConv (ops/conv.py) must be a drop-in for nn.Conv: identical primal,
identical dx, dW equal to f32 tolerance, and parameter-tree compatible.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.ops.conv import TapDWConv, _nhwc_conv, conv2d_tapdw
from aas_enhancement_tpu.ops.pallas.conv_dw_kernel import conv_dw_same


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


@pytest.mark.parametrize("shape", [
    # b, t, f, ci, co, kt, kf, strides
    (2, 37, 23, 8, 16, 5, 5, (1, 1)),
    (2, 33, 21, 8, 8, 3, 7, (1, 1)),
    (1, 40, 16, 16, 8, 1, 1, (1, 1)),
    (2, 29, 41, 8, 8, 11, 21, (1, 2)),   # AM.conv2 tap geometry
    (2, 30, 17, 8, 8, 5, 5, (1, 2)),
    (2, 16, 18, 8, 8, 4, 6, (1, 2)),     # even taps, even F
])
def test_dw_matches_xla(shape):
    b, t, f, ci, co, kt, kf, strides = shape
    kx, kw, kd = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (b, t, f, ci), jnp.float32)
    w = jax.random.normal(kw, (kt, kf, ci, co), jnp.float32)
    to, fo = -(-t // strides[0]), -(-f // strides[1])
    dy = jax.random.normal(kd, (b, to, fo, co), jnp.float32)

    ref = jax.vjp(lambda w_: _nhwc_conv(x, w_, strides), w)[1](dy)[0]
    got = conv_dw_same(x, dy, kt, kf, strides, interpret=True)
    assert _rel(got, ref) < 1e-5


def test_conv2d_tapdw_full_vjp():
    """Primal, dx and dW of the custom-VJP conv all match lax conv."""
    kx, kw, kd = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (2, 19, 15, 8), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 8, 8), jnp.float32)
    dy = jax.random.normal(kd, (2, 19, 15, 8), jnp.float32)

    y, pull = jax.vjp(lambda x_, w_: conv2d_tapdw(x_, w_, (1, 1), "pallas"),
                      x, w)
    y_ref, pull_ref = jax.vjp(lambda x_, w_: _nhwc_conv(x_, w_, (1, 1)), x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    dx, dw = pull(dy)
    dx_ref, dw_ref = pull_ref(dy)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref))
    assert _rel(dw, dw_ref) < 1e-5


def test_tapdw_module_drop_in_for_nn_conv():
    """TapDWConv: same param tree as nn.Conv, same primal, same grads."""
    x = jax.random.normal(jax.random.key(2), (2, 21, 17, 8), jnp.float32)
    tap = TapDWConv(8, kernel_size=(5, 5), strides=(1, 1), dw_impl="pallas")
    ref = nn.Conv(8, kernel_size=(5, 5), strides=(1, 1), padding="SAME")
    p_tap = tap.init(jax.random.key(3), x)
    p_ref = ref.init(jax.random.key(3), x)
    assert jax.tree.structure(p_tap) == jax.tree.structure(p_ref)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(p_tap), jax.tree.leaves(p_ref)))

    # Same params -> same primal; grads match to f32 tolerance.
    loss_tap = lambda p: jnp.sum(jnp.sin(tap.apply(p, x)))
    loss_ref = lambda p: jnp.sum(jnp.sin(ref.apply(p, x)))
    v_tap, g_tap = jax.value_and_grad(loss_tap)(p_ref)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(p_ref)
    assert float(abs(v_tap - v_ref)) == 0.0
    for a, b in zip(jax.tree.leaves(g_tap), jax.tree.leaves(g_ref)):
        assert _rel(a, b) < 1e-5


@pytest.mark.parametrize("impl", ["phase_split", "phase_fused"])
@pytest.mark.parametrize("shape", [
    # b, t, f, ci, co, kt, kf   (strides fixed at (1, 2))
    (2, 29, 81, 4, 8, 11, 21),   # AM.conv2 geometry: odd F, odd KF, pf_lo=10
    (2, 17, 80, 4, 4, 5, 21),    # even F with ODD pf_lo (pf_total=19)
    (2, 13, 18, 4, 4, 3, 6),     # even KF
    (1, 11, 7, 4, 4, 3, 1),      # KF=1: odd-parity phase has zero taps
    (2, 15, 16, 4, 4, 1, 5),     # KT=1
    (2, 12, 17, 4, 4, 4, 4),     # even everything, odd F
])
def test_phase_split_dx_matches_xla(shape, impl):
    from aas_enhancement_tpu.ops.conv import (conv_dx_phase_fused,
                                              conv_dx_phase_split)
    fn = conv_dx_phase_fused if impl == "phase_fused" else conv_dx_phase_split

    b, t, f, ci, co, kt, kf = shape
    strides = (1, 2)
    kw_, kd = jax.random.split(jax.random.key(5), 2)
    w = jax.random.normal(kw_, (kt, kf, ci, co), jnp.float32)
    to, fo = t, -(-f // 2)
    dy = jax.random.normal(kd, (b, to, fo, co), jnp.float32)
    x0 = jnp.zeros((b, t, f, ci), jnp.float32)

    ref = jax.vjp(lambda x_: _nhwc_conv(x_, w, strides), x0)[1](dy)[0]
    got = fn(dy, w, x0.shape, strides)
    assert got.shape == ref.shape
    assert _rel(got, ref) < 1e-5


@pytest.mark.parametrize("shape", [
    # b, t, f, ci, co, kt, kf   (strides fixed at (1, 2))
    (2, 29, 81, 4, 8, 11, 21),   # AM.conv2 geometry: odd F, odd KF, pf_lo=10
    (2, 17, 80, 4, 4, 5, 21),    # even F with ODD pf_lo (pf_total=19)
    (2, 13, 18, 4, 4, 3, 6),     # even KF
    (1, 11, 7, 4, 4, 3, 1),      # KF=1: one parity has zero taps
    (2, 15, 16, 4, 4, 1, 5),     # KT=1
    (2, 12, 17, 4, 4, 4, 4),     # even everything, odd F
])
def test_freq_fold_conv_matches_xla(shape):
    """conv2d_freq_fold: forward AND both autodiff grads match the lax conv
    to f32 summation-order tolerance."""
    from aas_enhancement_tpu.ops.conv import conv2d_freq_fold

    b, t, f, ci, co, kt, kf = shape
    kx, kw_, kd = jax.random.split(jax.random.key(8), 3)
    x = jax.random.normal(kx, (b, t, f, ci), jnp.float32)
    w = jax.random.normal(kw_, (kt, kf, ci, co), jnp.float32)
    dy = jax.random.normal(kd, (b, t, -(-f // 2), co), jnp.float32)

    y, pull = jax.vjp(conv2d_freq_fold, x, w)
    y_ref, pull_ref = jax.vjp(lambda x_, w_: _nhwc_conv(x_, w_, (1, 2)), x, w)
    assert y.shape == y_ref.shape
    assert _rel(y, y_ref) < 1e-5
    (dx, dw), (dx_ref, dw_ref) = pull(dy), pull_ref(dy)
    assert _rel(dx, dx_ref) < 1e-5
    assert _rel(dw, dw_ref) < 1e-5


def test_freq_fold_module_drop_in():
    """TapDWConv(impl="freq_fold") keeps the nn.Conv param tree and output."""
    import numpy as np
    from aas_enhancement_tpu.ops.conv import TapDWConv

    x = jax.random.normal(jax.random.key(9), (2, 19, 17, 4), jnp.float32)
    ref_mod = nn.Conv(8, kernel_size=(5, 7), strides=(1, 2), padding="SAME")
    mod = TapDWConv(8, kernel_size=(5, 7), strides=(1, 2), impl="freq_fold")
    params = ref_mod.init(jax.random.key(1), x)
    y_ref = ref_mod.apply(params, x)
    y = mod.apply(params, x)
    assert y.shape == y_ref.shape
    assert _rel(y, y_ref) < 1e-5


def test_conv2d_phasedx_full_vjp():
    """conv2d_tapdw with dx_impl=phase_split: primal + dW match lax conv
    exactly, dx to f32 tolerance."""
    kx, kw_, kd = jax.random.split(jax.random.key(6), 3)
    x = jax.random.normal(kx, (2, 19, 17, 4), jnp.float32)
    w = jax.random.normal(kw_, (5, 7, 4, 8), jnp.float32)
    dy = jax.random.normal(kd, (2, 19, 9, 8), jnp.float32)

    y, pull = jax.vjp(
        lambda x_, w_: conv2d_tapdw(x_, w_, (1, 2), "xla", "phase_split"),
        x, w)
    y_ref, pull_ref = jax.vjp(lambda x_, w_: _nhwc_conv(x_, w_, (1, 2)), x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    dx, dw = pull(dy)
    dx_ref, dw_ref = pull_ref(dy)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dw_ref))
    assert _rel(dx, dx_ref) < 1e-5


def test_tapdw_unsupported_shapes_fall_back():
    """ci=1 (G.conv0 class) and stride (2,2) route to the XLA dW and still
    produce correct gradients."""
    for (ci, strides) in [(1, (1, 1)), (8, (2, 2))]:
        kx, kw = jax.random.split(jax.random.key(4), 2)
        x = jax.random.normal(kx, (2, 12, 10, ci), jnp.float32)
        w = jax.random.normal(kw, (3, 3, ci, 8), jnp.float32)
        loss = lambda w_: jnp.sum(conv2d_tapdw(x, w_, strides, "pallas") ** 2)
        loss_ref = lambda w_: jnp.sum(_nhwc_conv(x, w_, strides) ** 2)
        g = jax.grad(loss)(w)
        g_ref = jax.grad(loss_ref)(w)
        assert _rel(g, g_ref) < 1e-5
