"""Streaming enhancement: chunked output covers the input, block-bidirectional
context only (SURVEY.md §5 long-context row; BASELINE.json:5 streaming)."""

import jax
import numpy as np
import pytest

from aas_enhancement_tpu.config import Config, EnhancerConfig
from aas_enhancement_tpu.data.synthetic import synth_utterance
from aas_enhancement_tpu.enhance import enhance_utterance, init_enhancer
from aas_enhancement_tpu.streaming import StreamingEnhancer, enhance_stream


@pytest.fixture(scope="module")
def setup():
    cfg = Config(enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=16, rnn_layers=1))
    params = init_enhancer(cfg, jax.random.key(0))
    return cfg, params


def test_stream_covers_input(setup):
    cfg, params = setup
    wav = synth_utterance("HELLO STREAMING WORLD TEST", seed=1)
    chunks = list(enhance_stream(cfg, params, wav, chunk_seconds=0.5,
                                 lookahead_seconds=0.1))
    out = np.concatenate(chunks)
    assert out.shape == wav.shape
    assert np.all(np.isfinite(out))
    assert np.std(out) > 0


def test_stream_close_to_offline_in_interior(setup):
    """Block-bidirectional streaming approximates the offline result away from
    block boundaries (identical conv receptive fields, truncated bwd LSTM)."""
    cfg, params = setup
    wav = synth_utterance("ABC DEF GHI JKL", seed=2)
    offline = enhance_utterance(cfg, params, wav)
    streamed = np.concatenate(list(enhance_stream(cfg, params, wav,
                                                  chunk_seconds=0.5,
                                                  lookahead_seconds=0.3)))
    # Same scale and strongly correlated (not bit-equal: bwd context truncation).
    corr = np.corrcoef(offline, streamed)[0, 1]
    assert corr > 0.95, f"streaming diverged from offline: corr={corr}"


def test_incremental_feed_equals_bulk(setup):
    cfg, params = setup
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)

    eng = StreamingEnhancer(cfg, params, chunk_seconds=0.5, lookahead_seconds=0.1)
    outs = [eng.feed(wav[i: i + 1000]) for i in range(0, len(wav), 1000)]
    outs.append(eng.flush())
    incremental = np.concatenate([o for o in outs if len(o)])

    eng2 = StreamingEnhancer(cfg, params, chunk_seconds=0.5, lookahead_seconds=0.1)
    bulk = np.concatenate([eng2.feed(wav), eng2.flush()])
    np.testing.assert_allclose(incremental, bulk, atol=1e-6)


def test_history_improves_offline_agreement(setup):
    """Left context + running normalization (round-2 redesign) must track the
    offline result more closely than the zero-history configuration."""
    cfg, params = setup
    wav = synth_utterance("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG", seed=5)
    offline = enhance_utterance(cfg, params, wav)

    def corr(history):
        streamed = np.concatenate(list(enhance_stream(
            cfg, params, wav, chunk_seconds=0.5, lookahead_seconds=0.2,
            history_seconds=history)))
        return np.corrcoef(offline, streamed)[0, 1]

    c_none, c_hist = corr(0.0), corr(1.0)
    assert c_hist > 0.97, f"history streaming far from offline: {c_hist}"
    assert c_hist >= c_none - 1e-3, (
        f"history made agreement worse: {c_none} -> {c_hist}")


def test_streaming_stats_converge_to_offline(setup):
    """The running normalization moments must approach the full-utterance
    moments used offline."""
    import jax.numpy as jnp
    from aas_enhancement_tpu.streaming import StreamingEnhancer
    from aas_enhancement_tpu.train.objectives import device_features

    cfg, params = setup
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(48000) * 0.1).astype(np.float32)
    eng = StreamingEnhancer(cfg, params, chunk_seconds=0.5,
                            lookahead_seconds=0.1, history_seconds=0.5)
    eng.feed(wav)
    eng.flush()
    stream_mean = eng._sum / eng._count

    _, log_mag, fl = device_features(cfg, jnp.asarray(wav)[None],
                                     jnp.array([len(wav)], np.int32))
    offline_mean = float(np.sum(np.asarray(log_mag)[0][: int(fl[0])])
                         / (int(fl[0]) * log_mag.shape[2]))
    assert abs(stream_mean - offline_mean) < 0.05 * max(abs(offline_mean), 0.1)
