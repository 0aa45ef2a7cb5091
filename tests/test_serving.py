"""Serving export (serving.py): jax.export artifact round-trip.

The exported program must be self-contained (weights baked in) and agree with
the live enhance path exactly; the loader's bucket dispatch must pad and strip
correctly and reject inputs no bucket covers."""

import numpy as np
import pytest

from aas_enhancement_tpu.config import Config, EnhancerConfig
from aas_enhancement_tpu.enhance import init_enhancer, make_enhance_fn
from aas_enhancement_tpu.serving import export_enhancer, load_enhancer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    cfg = Config(enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=16, rnn_layers=1))
    params = init_enhancer(cfg, jax.random.key(0))
    out = str(tmp_path_factory.mktemp("serving"))
    manifest = export_enhancer(cfg, params, out, batch_sizes=(1, 2),
                               seconds=(0.5, 1.0))
    return cfg, params, out, manifest


def test_manifest_written(setup):
    _, _, out, manifest = setup
    assert len(manifest["entries"]) == 4
    assert manifest["sample_rate"] == 16000
    served = load_enhancer(out)
    assert served.buckets() == [(1, 8000), (1, 16000), (2, 8000), (2, 16000)]


def test_roundtrip_matches_live_path(setup):
    cfg, params, out, _ = setup
    served = load_enhancer(out)
    fn = make_enhance_fn(cfg)
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    lengths = np.array([16000, 12000], np.int32)
    live = np.asarray(fn(params, wav, lengths))
    exported = served.enhance(wav, lengths)
    assert exported.shape == wav.shape
    np.testing.assert_array_equal(exported, live)


def test_bucket_padding_dispatch(setup):
    """A (1, 10000) input runs in the smallest covering bucket (1, 16000) and
    must equal the live path run at that padded shape, stripped back."""
    cfg, params, out, _ = setup
    served = load_enhancer(out)
    fn = make_enhance_fn(cfg)
    wav = np.random.default_rng(1).standard_normal(10000).astype(np.float32) * 0.1
    exported = served.enhance(wav)
    pad = np.zeros((1, 16000), np.float32)
    pad[0, :10000] = wav
    live = np.asarray(fn(params, pad, np.array([10000], np.int32)))[0, :10000]
    np.testing.assert_array_equal(exported[0], live)


def test_uncovered_shape_rejected(setup):
    _, _, out, _ = setup
    served = load_enhancer(out)
    with pytest.raises(ValueError, match="no exported bucket"):
        served.enhance(np.zeros((4, 8000), np.float32))
    with pytest.raises(ValueError, match="no exported bucket"):
        served.enhance(np.zeros((1, 20000), np.float32))


def test_artifact_needs_no_params(setup):
    """The serialized program embeds the weights: loading in a fresh module
    namespace with no checkpoint access still reproduces the output."""
    _, _, out, _ = setup
    served = load_enhancer(out)
    wav = np.random.default_rng(2).standard_normal((1, 8000)).astype(np.float32)
    a = served.enhance(wav)
    b = load_enhancer(out).enhance(wav)
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
