"""Fused masked GroupNorm Pallas kernels vs the pure-JAX reference.

Value AND gradient parity (interpret mode on the CPU suite; the same kernels
compile on TPU).  The reference is ops/norm.MaskedGroupNorm impl="xla"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.ops.norm import MaskedGroupNorm
from aas_enhancement_tpu.ops.pallas.gn_kernel import masked_group_norm_act


def _data(b=2, t=37, f=9, c=16, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, t, f, c)).astype(dtype)
    scale = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(c)).astype(np.float32)
    lengths = np.array([t, t - 13][:b], np.int32)
    return x, scale, bias, lengths


def _reference(x, scale, bias, lengths, act, num_groups=8, dtype=jnp.float32):
    gn = MaskedGroupNorm(num_groups=num_groups, dtype=dtype, act=act,
                         impl="xla")
    return gn.apply({"params": {"scale": scale, "bias": bias}},
                    jnp.asarray(x), jnp.asarray(lengths))


@pytest.mark.parametrize("act", ["none", "leaky_relu", "hardtanh"])
def test_forward_matches_reference(act):
    x, scale, bias, lengths = _data()
    ref = _reference(x, scale, bias, lengths, act)
    out = masked_group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), jnp.asarray(lengths),
                                num_groups=8, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["none", "leaky_relu", "hardtanh"])
def test_grads_match_reference(act):
    x, scale, bias, lengths = _data(seed=3)

    def loss_ref(x_, s_, b_):
        y = _reference(x_, s_, b_, lengths, act)
        return jnp.sum(y * jnp.cos(y))          # nontrivial cotangent

    def loss_ker(x_, s_, b_):
        y = masked_group_norm_act(x_, s_, b_, jnp.asarray(lengths),
                                  num_groups=8, act=act, interpret=True)
        return jnp.sum(y * jnp.cos(y))

    args = (jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_ref, g_ker, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bf16_storage_f32_stats():
    """bf16 activations stream in bf16 but stats accumulate in f32: the
    result must stay within bf16 rounding of the f32 reference."""
    x, scale, bias, lengths = _data(seed=5)
    ref = _reference(x, scale, bias, lengths, "leaky_relu", dtype=jnp.bfloat16)
    out = masked_group_norm_act(jnp.asarray(x, jnp.bfloat16),
                                jnp.asarray(scale), jnp.asarray(bias),
                                jnp.asarray(lengths), num_groups=8,
                                act="leaky_relu", out_dtype=jnp.bfloat16,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_padding_invariance():
    """Rows past `lengths` must not affect outputs (the framework invariant)."""
    x, scale, bias, lengths = _data(seed=7)
    x2 = np.array(x)
    x2[1, lengths[1]:] = 99.0                    # garbage in padded frames
    a = masked_group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                              jnp.asarray(bias), jnp.asarray(lengths),
                              num_groups=8, act="leaky_relu", interpret=True)
    b = masked_group_norm_act(jnp.asarray(x2), jnp.asarray(scale),
                              jnp.asarray(bias), jnp.asarray(lengths),
                              num_groups=8, act="leaky_relu", interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a)[1, lengths[1]:], 0.0)


def test_module_dispatch_pallas_matches_xla():
    """MaskedGroupNorm impl='pallas' (interpret via monkeypatched flag is not
    exposed; use the function directly) equals impl='xla' — the module's two
    paths are interchangeable."""
    x, scale, bias, lengths = _data(seed=11, t=64)
    ref = _reference(x, scale, bias, lengths, "hardtanh")
    out = masked_group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), jnp.asarray(lengths),
                                num_groups=8, act="hardtanh", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_uneven_time_tiles():
    """T not a multiple of the tile size exercises the padded final tile."""
    x, scale, bias, lengths = _data(seed=13, t=131)
    ref = _reference(x, scale, bias, lengths, "none")
    out = masked_group_norm_act(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), jnp.asarray(lengths),
                                num_groups=8, act="none", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
