"""SpaceToDepthConv must be weight-compatible with and numerically equal to
nn.Conv(strides=(2,2), padding=SAME) for single-channel input."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.ops.conv import SpaceToDepthConv


@pytest.mark.parametrize("t,f", [(64, 161), (63, 81), (101, 40)])
def test_matches_flax_conv(t, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, f, 1)), jnp.float32)

    ref = nn.Conv(8, kernel_size=(11, 41), strides=(2, 2), padding="SAME")
    s2d = SpaceToDepthConv(8, kernel_size=(11, 41))
    p_ref = ref.init(jax.random.key(1), x)
    # identical param pytree structure -> checkpoints interchange
    p_s2d = s2d.init(jax.random.key(2), x)
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_s2d)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_s2d)))

    y_ref = ref.apply(p_ref, x)
    y_s2d = s2d.apply(p_ref, x)   # SAME weights
    assert y_s2d.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 50, 81, 1)), jnp.float32)
    ref = nn.Conv(8, kernel_size=(5, 7), strides=(2, 2), padding="SAME")
    s2d = SpaceToDepthConv(8, kernel_size=(5, 7))
    p = ref.init(jax.random.key(1), x)
    g_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(p)
    g_s2d = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
