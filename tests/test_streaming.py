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


# ------------------------------------------------- streaming-aware training

def test_blockwise_apply_single_window_matches_full(setup):
    """One window covering the whole utterance (no history/lookahead) must
    reproduce the offline forward exactly — padding invariance of the masked
    ops makes the window's trailing pad frames inert."""
    from aas_enhancement_tpu.models.enhancer import Enhancer, blockwise_apply

    cfg, params = setup
    rng = np.random.default_rng(0)
    t, f = 37, cfg.audio.num_bins
    net_in = rng.standard_normal((2, t, f)).astype(np.float32)
    lengths = np.array([t, 29], np.int32)
    full = Enhancer(cfg.enhancer).apply(params, net_in, lengths)
    block = blockwise_apply(cfg.enhancer, params, net_in, lengths,
                            chunk_f=48, look_f=0, hist_f=0)
    np.testing.assert_allclose(np.asarray(block), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_blockwise_apply_shapes_and_masking(setup):
    from aas_enhancement_tpu.models.enhancer import blockwise_apply

    cfg, params = setup
    rng = np.random.default_rng(1)
    t, f = 53, cfg.audio.num_bins
    net_in = rng.standard_normal((2, t, f)).astype(np.float32)
    lengths = np.array([t, 20], np.int32)
    out = blockwise_apply(cfg.enhancer, params, net_in, lengths,
                          chunk_f=16, look_f=4, hist_f=8)
    assert out.shape == (2, t, f)
    assert np.all(np.isfinite(np.asarray(out)))
    # Padded frames stay zero (apply_time_mask at the stitch).
    np.testing.assert_array_equal(np.asarray(out)[1, 20:], 0.0)


@pytest.mark.slow
def test_streaming_finetune_loss_decreases(tmp_path):
    """The AAS objective trains through the block-bidirectional forward
    (TrainConfig.streaming_finetune) and still learns."""
    import dataclasses

    from aas_enhancement_tpu.config import (AMConfig, DataConfig,
                                            DiscriminatorConfig, TrainConfig)
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.train.loop import train

    corpus = generate_corpus(str(tmp_path), n_utts=8, seed=11, vocab_chars=6)
    cfg = Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=24, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective="aas", batch_size=4, epochs=100,
                          log_every=1, lr_g=2e-3, lr_d=2e-3,
                          streaming_finetune=True, stream_chunk_s=0.5,
                          stream_lookahead_s=0.1, stream_history_s=0.5),
        data=DataConfig(num_buckets=1),
    )
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=14)
    vals = [r["loss_g"] for r in recs if "loss_g" in r]
    assert len(vals) >= 10
    assert np.mean(vals[-3:]) < np.mean(vals[:3]), (
        f"streaming-finetune loss did not decrease: {vals[:3]} -> {vals[-3:]}")


@pytest.mark.slow
def test_am_streaming_finetune_loss_decreases(tmp_path):
    """The AM objective trains through the block-streaming AM forward
    (TrainConfig.streaming_finetune_am) and still learns."""
    from aas_enhancement_tpu.config import AMConfig, DataConfig, TrainConfig
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.train.loop import train

    corpus = generate_corpus(str(tmp_path), n_utts=8, seed=12, vocab_chars=6)
    cfg = Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        train=TrainConfig(objective="am", batch_size=4, epochs=100,
                          log_every=1, lr_am=2e-3,
                          streaming_finetune_am=True, stream_chunk_s=0.5,
                          stream_lookahead_s=0.1, stream_history_s=0.5),
        data=DataConfig(num_buckets=1),
    )
    _, recs = train(cfg, corpus["clean"], max_steps=14)
    vals = [r["loss_ctc_am"] for r in recs if "loss_ctc_am" in r]
    assert len(vals) >= 10
    assert np.mean(vals[-3:]) < np.mean(vals[:3]), (
        f"AM streaming-finetune loss did not decrease: {vals[:3]} -> {vals[-3:]}")


@pytest.mark.slow
def test_am_adaptation_through_frozen_streaming_enhancer(tmp_path):
    """The full live-chain AM adaptation objective (frozen block-streaming G
    -> block-streaming AM, TrainConfig.am_through_enhancer) learns, and the
    frozen G is bit-identical before/after."""
    from aas_enhancement_tpu.config import AMConfig, DataConfig, TrainConfig
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.train.loop import init_state, train

    corpus = generate_corpus(str(tmp_path), n_utts=8, seed=13, vocab_chars=6)
    cfg = Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=16, rnn_layers=1),
        train=TrainConfig(objective="am", batch_size=4, epochs=100,
                          log_every=1, lr_am=2e-3, am_through_enhancer=True,
                          streaming_finetune=True, streaming_finetune_am=True,
                          stream_chunk_s=0.5, stream_lookahead_s=0.1,
                          stream_history_s=0.5),
        data=DataConfig(num_buckets=1),
    )
    state0 = init_state(cfg, jax.random.key(3))
    g_before = jax.tree.map(np.array, state0.g_params)
    state, recs = train(cfg, corpus["noisy"], max_steps=14, state=state0)
    vals = [r["loss_ctc_am"] for r in recs if "loss_ctc_am" in r]
    assert len(vals) >= 10
    assert np.mean(vals[-3:]) < np.mean(vals[:3]), (
        f"AM adaptation loss did not decrease: {vals[:3]} -> {vals[-3:]}")
    for a, b in zip(jax.tree.leaves(g_before),
                    jax.tree.leaves(jax.device_get(state.g_params))):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_distill_anchored_am_adaptation(tmp_path):
    """TrainConfig.distill_lambda (VERDICT r4 #1c): the posterior-anchor KL
    term (a) reports zero at the anchor itself, (b) keeps the adapted AM's
    posteriors measurably closer to the base AM's than the un-anchored
    adaptation at the same step budget, while CTC still decreases."""
    from aas_enhancement_tpu.config import AMConfig, DataConfig, TrainConfig
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.models.am import AcousticModel
    from aas_enhancement_tpu.train.loop import init_state, train

    corpus = generate_corpus(str(tmp_path), n_utts=8, seed=14, vocab_chars=6)

    def cfg_with(lam):
        return Config(
            am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
            train=TrainConfig(objective="am", batch_size=4, epochs=100,
                              log_every=1, lr_am=2e-3, distill_lambda=lam,
                              streaming_finetune_am=True, stream_chunk_s=0.5,
                              stream_lookahead_s=0.1, stream_history_s=0.5),
            data=DataConfig(num_buckets=1),
        )

    state0 = init_state(cfg_with(0.0), jax.random.key(5))
    am0 = jax.device_get(state0.am_params)

    st_plain, _ = train(cfg_with(0.0), corpus["clean"], max_steps=14,
                        state=state0.replace())
    st_dist, recs = train(cfg_with(3.0), corpus["clean"], max_steps=14,
                          state=init_state(cfg_with(3.0), jax.random.key(5)))

    kls = [r["loss_distill"] for r in recs if "loss_distill" in r]
    ctcs = [r["loss_ctc_am"] for r in recs if "loss_ctc_am" in r]
    assert len(kls) >= 10
    # (a) KL(x||x) is exactly 0 (unit property of the term itself); the
    # training trace starts NON-zero because the adapted forward is blockwise
    # while the anchor is offline — the very gap the term penalizes — and
    # stays finite.
    from aas_enhancement_tpu.train.objectives import distill_kl
    x = jnp_logits = np.asarray(
        np.random.default_rng(1).standard_normal((2, 7, 9)), np.float32)
    assert float(distill_kl(x, jnp_logits,
                            np.array([7, 4], np.int32))) == 0.0
    assert np.all(np.isfinite(kls))
    # CTC still learns under the anchor.
    assert np.mean(ctcs[-3:]) < np.mean(ctcs[:3])

    # (b) posterior drift from the base AM: distilled < plain.
    from aas_enhancement_tpu.train.objectives import device_features
    from aas_enhancement_tpu.ops.masking import masked_normalize, time_mask
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    wl = np.array([8000, 8000], np.int32)
    cfg = cfg_with(0.0)
    _, log_mag, fl = device_features(cfg, wav, wl)
    am_in = masked_normalize(log_mag, fl)

    def posteriors(params):
        logits, ol = AcousticModel(cfg.am).apply(params, am_in, fl)
        return jax.nn.log_softmax(np.asarray(logits, np.float32), -1), ol

    base_lp, ol = posteriors(am0)
    drift = {}
    for tag, st in (("plain", st_plain), ("distill", st_dist)):
        lp, _ = posteriors(jax.device_get(st.am_params))
        kl = np.sum(np.exp(base_lp) * (base_lp - lp), -1)
        m = np.asarray(time_mask(ol, kl.shape[1]))
        drift[tag] = float(np.sum(kl * m) / np.sum(m))
    assert drift["distill"] < drift["plain"], drift
