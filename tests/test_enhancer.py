"""Enhancer module + config-1 end-to-end slice (SURVEY.md §4 items 2, 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.enhance import enhance_utterance, init_enhancer, make_enhance_fn
from aas_enhancement_tpu.models.enhancer import Enhancer, apply_enhancement
from aas_enhancement_tpu.data.synthetic import synth_utterance


@pytest.fixture(scope="module")
def cfg():
    return Config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_enhancer(cfg, jax.random.key(0))


def test_forward_shapes_mask(cfg, params):
    model = Enhancer(cfg.enhancer)
    x = jnp.ones((2, 50, cfg.audio.num_bins))
    lengths = jnp.array([50, 30])
    out = jax.jit(model.apply)(params, x, lengths)
    assert out.shape == (2, 50, cfg.audio.num_bins)
    assert out.dtype == jnp.float32
    # mask mode output in (0, 1), zero at padding
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    assert float(jnp.abs(out[1, 30:]).max()) == 0.0


def test_mapping_mode(cfg):
    ecfg = cfg.enhancer.__class__(mode="mapping")
    model = Enhancer(ecfg)
    x = jnp.ones((1, 20, cfg.audio.num_bins))
    lengths = jnp.array([20])
    p = model.init(jax.random.key(1), x, lengths)
    out = model.apply(p, x, lengths)
    assert float(jnp.min(out)) >= 0.0  # softplus: non-negative log1p-mag
    mag = apply_enhancement(ecfg, out, jnp.ones_like(out))
    assert float(jnp.min(mag)) >= 0.0


def test_padding_invariance(cfg, params):
    """Padded batch outputs == per-utterance outputs on valid frames (SURVEY.md §4.1)."""
    model = Enhancer(cfg.enhancer)
    rng = np.random.default_rng(0)
    x_short = jnp.asarray(rng.standard_normal((1, 37, cfg.audio.num_bins)), jnp.float32)
    solo = model.apply(params, x_short, jnp.array([37]))
    padded = jnp.pad(x_short, ((0, 0), (0, 23), (0, 0)))
    batch = model.apply(params, padded, jnp.array([37]))
    np.testing.assert_allclose(np.asarray(batch[:, :37]), np.asarray(solo),
                               atol=1e-5, rtol=1e-5)


def test_config1_single_utterance_end_to_end(cfg, params):
    """Driver config 1 (BASELINE.json:7): wav -> STFT -> G -> ISTFT, batch 1, CPU."""
    wav = synth_utterance("HELLO WORLD", seed=3)
    noisy = wav + 0.05 * np.random.default_rng(0).standard_normal(len(wav)).astype(np.float32)
    out = enhance_utterance(cfg, params, noisy)
    assert out.shape == noisy.shape
    assert np.all(np.isfinite(out))
    assert np.std(out) > 0  # non-degenerate output


def test_enhance_batched_matches_single(cfg, params):
    fn = make_enhance_fn(cfg)
    rng = np.random.default_rng(1)
    wavs = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    lengths = jnp.array([8000, 8000], jnp.int32)
    batch = fn(params, jnp.asarray(wavs), lengths)
    single = fn(params, jnp.asarray(wavs[:1]), lengths[:1])
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(single[0]),
                               atol=1e-4, rtol=1e-4)


def test_enhance_cli_long_audio_not_truncated(cfg, params, tmp_path):
    """Audio longer than the largest bucket must be fully enhanced (was silently
    truncated to 16 s before the round-1 review)."""
    import numpy as np
    from aas_enhancement_tpu.cli.enhance import _bucket_length
    sr = cfg.audio.sample_rate
    buckets = [sr * s for s in (2, 4, 8, 16)]
    n = 19 * sr
    padded = _bucket_length(n, buckets)
    assert padded >= n
    assert padded % buckets[-1] == 0
