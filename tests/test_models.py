"""AM / discriminator module tests (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.config import AMConfig, DiscriminatorConfig
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.discriminator import Discriminator

F = 161


@pytest.fixture(scope="module")
def am_and_params():
    cfg = AMConfig(rnn_hidden=32, rnn_layers=2, conv_channels=8)
    model = AcousticModel(cfg)
    x = jnp.zeros((2, 40, F))
    lengths = jnp.array([40, 40])
    params = model.init(jax.random.key(0), x, lengths)
    return model, params


def test_am_shapes_and_lengths(am_and_params):
    model, params = am_and_params
    x = jnp.ones((2, 40, F))
    lengths = jnp.array([40, 25])
    logits, out_lengths = jax.jit(model.apply)(params, x, lengths)
    assert logits.shape == (2, 20, 29)       # time downsampled 2x by conv1
    assert logits.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_lengths), [20, 13])
    # padded frames masked to zero
    assert float(jnp.abs(logits[1, 13:]).max()) == 0.0


def test_am_padding_invariance(am_and_params):
    model, params = am_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 24, F)), jnp.float32)
    solo, solo_len = model.apply(params, x, jnp.array([24]))
    x_pad = jnp.pad(x, ((0, 0), (0, 16), (0, 0)))
    padded, _ = model.apply(params, x_pad, jnp.array([24]))
    np.testing.assert_allclose(np.asarray(padded[:, : int(solo_len[0])]),
                               np.asarray(solo), atol=1e-4, rtol=1e-4)


def test_am_param_count_golden(am_and_params):
    """Parameter count frozen in a golden value (SURVEY.md §4 item 2)."""
    _, params = am_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 101_573, f"param count changed: {n}"


def test_discriminator_score(am_and_params):
    cfg = DiscriminatorConfig(channels=(8, 16))
    model = Discriminator(cfg)
    x = jnp.ones((3, 40, F))
    lengths = jnp.array([40, 30, 20])
    params = model.init(jax.random.key(1), x, lengths)
    score = jax.jit(model.apply)(params, x, lengths)
    assert score.shape == (3,)
    assert np.all(np.isfinite(np.asarray(score)))


def test_discriminator_padding_invariance():
    cfg = DiscriminatorConfig(channels=(8, 16))
    model = Discriminator(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 28, F)), jnp.float32)
    params = model.init(jax.random.key(2), x, jnp.array([28]))
    solo = model.apply(params, x, jnp.array([28]))
    x_pad = jnp.pad(x, ((0, 0), (0, 12), (0, 0)))
    padded = model.apply(params, x_pad, jnp.array([28]))
    np.testing.assert_allclose(np.asarray(padded), np.asarray(solo),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_default_param_count_goldens():
    """Golden parameter counts for the DEFAULT configs (SURVEY.md §4 item 2) —
    catches accidental architecture drift between rounds."""
    from aas_enhancement_tpu.config import (AMConfig, DiscriminatorConfig,
                                            EnhancerConfig)
    from aas_enhancement_tpu.models import Discriminator, Enhancer
    x = jnp.zeros((1, 40, F))
    lens = jnp.array([40])
    goldens = {
        "am": (AcousticModel(AMConfig()), 15_331_133),
        "enhancer": (Enhancer(EnhancerConfig()), 12_200_321),
        "discriminator": (Discriminator(DiscriminatorConfig()), 259_713),
    }
    for name, (model, want) in goldens.items():
        p = model.init(jax.random.key(0), x, lens)
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p))
        assert n == want, f"{name} param count drifted: {n} != {want}"
