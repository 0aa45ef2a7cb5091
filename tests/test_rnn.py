"""Masked BiRNN numerics (SURVEY.md §4 item 1/2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.ops.rnn import BiRNN


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_padding_invariance(cell):
    """Hidden state freezes at padding: padded batch == per-utterance run."""
    model = BiRNN(hidden=16, cell=cell)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 11, 8)), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.array([11]))
    solo = model.apply(params, x, jnp.array([11]))

    x_pad = jnp.pad(x, ((0, 0), (0, 9), (0, 0)),
                    constant_values=7.5)  # garbage in the pad region must not leak
    padded = model.apply(params, x_pad, jnp.array([11]))
    np.testing.assert_allclose(np.asarray(padded[:, :11]), np.asarray(solo),
                               atol=1e-6, rtol=1e-6)
    # outputs at padded steps are masked to zero
    assert float(jnp.abs(padded[:, 11:]).max()) == 0.0


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_bidirectional_differs_from_reversed(cell):
    """fwd+bwd sum is direction-sensitive (not accidentally symmetric)."""
    model = BiRNN(hidden=8, cell=cell)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 9, 4)), jnp.float32)
    params = model.init(jax.random.key(1), x, jnp.array([9]))
    y = model.apply(params, x, jnp.array([9]))
    y_rev = model.apply(params, jnp.flip(x, 1), jnp.array([9]))
    assert not np.allclose(np.asarray(y), np.asarray(jnp.flip(y_rev, 1)), atol=1e-3)


def test_grad_flows():
    model = BiRNN(hidden=8, cell="lstm")
    x = jnp.ones((2, 7, 4))
    lengths = jnp.array([7, 5])
    params = model.init(jax.random.key(2), x, lengths)

    def loss(p):
        return jnp.sum(model.apply(p, x, lengths) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
