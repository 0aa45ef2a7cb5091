"""Block-streaming recognition: stitched AM frames must cover the utterance
exactly (no gaps/overlaps vs the offline forward), approximate the offline
logits away from block boundaries, and be deterministic in feed granularity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aas_enhancement_tpu.config import AMConfig, Config, EnhancerConfig
from aas_enhancement_tpu.data.synthetic import synth_utterance
from aas_enhancement_tpu.enhance import init_enhancer
from aas_enhancement_tpu.evaluation import make_eval_forward
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.streaming_asr import StreamingRecognizer

KW = dict(chunk_seconds=0.5, lookahead_seconds=0.2, history_seconds=0.5)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(am=AMConfig(rnn_hidden=16, rnn_layers=1, conv_channels=8),
                 enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=8, rnn_layers=1))
    am = AcousticModel(cfg.am)
    x = jnp.zeros((1, 64, cfg.audio.num_bins), jnp.float32)
    am_params = am.init(jax.random.key(0), x, jnp.array([64], jnp.int32))
    g_params = init_enhancer(cfg, jax.random.key(1))
    return cfg, am_params, g_params


def offline_logits(cfg, am_params, wav, g_params=None):
    fwd = make_eval_forward(cfg, use_enhancer=g_params is not None)
    logits, pads = fwd(am_params, g_params if g_params is not None else {},
                       jnp.asarray(wav)[None], jnp.array([len(wav)], jnp.int32))
    n = int(np.sum(np.asarray(pads)[0] < 0.5))
    return np.asarray(logits)[0, :n]


@pytest.mark.parametrize("n_extra", [0, 1000, 7999])
def test_frame_coverage_matches_offline(setup, n_extra):
    """Total emitted AM frames == the offline forward's out_length, for
    chunk-aligned and ragged utterance lengths alike."""
    cfg, am_params, _ = setup
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 + n_extra) * 0.1).astype(np.float32)
    rec = StreamingRecognizer(cfg, am_params, **KW)
    ids = rec.feed(wav) + rec.flush()
    off = offline_logits(cfg, am_params, wav)
    assert len(ids) == len(off)


def test_interior_logits_close_to_offline(setup):
    """Away from block boundaries the streamed logits approximate offline
    (same convs; BiGRU backward direction truncated at the lookahead)."""
    cfg, am_params, _ = setup
    wav = synth_utterance("STREAMING RECOGNITION CHECK", seed=3)
    rec = StreamingRecognizer(cfg, am_params, collect_logits=True, **KW)
    rec.feed(wav)
    rec.flush()
    streamed = rec.log_probs()
    off = np.asarray(jax.nn.log_softmax(
        jnp.asarray(offline_logits(cfg, am_params, wav)), axis=-1))
    assert streamed.shape == off.shape
    corr = np.corrcoef(streamed.ravel(), off.ravel())[0, 1]
    assert corr > 0.9, f"streamed logits diverged from offline: corr={corr}"


def test_incremental_feed_equals_bulk(setup):
    cfg, am_params, g_params = setup
    wav = synth_utterance("FEED GRANULARITY MUST NOT MATTER", seed=4)

    rec1 = StreamingRecognizer(cfg, am_params, g_params=g_params, **KW)
    ids1 = []
    for i in range(0, len(wav), 1234):
        ids1 += rec1.feed(wav[i: i + 1234])
    ids1 += rec1.flush()

    rec2 = StreamingRecognizer(cfg, am_params, g_params=g_params, **KW)
    ids2 = rec2.feed(wav) + rec2.flush()
    assert ids1 == ids2
    assert rec1.transcript() == rec2.transcript()


def test_enhancer_pipeline_runs(setup):
    """Full live pipeline (enhancer -> AM) emits the offline frame count."""
    cfg, am_params, g_params = setup
    wav = synth_utterance("ENHANCE THEN RECOGNIZE", seed=5)
    rec = StreamingRecognizer(cfg, am_params, g_params=g_params, **KW)
    ids = rec.feed(wav) + rec.flush()
    off = offline_logits(cfg, am_params, wav, g_params=g_params)
    assert len(ids) == len(off)
    assert isinstance(rec.transcript(), str)


def test_batched_recognizer_matches_single(setup):
    """Concurrent sessions in BatchedStreamingRecognizer emit the same id
    frames and transcripts as independent StreamingRecognizer runs."""
    from aas_enhancement_tpu.streaming_asr import BatchedStreamingRecognizer

    cfg, am_params, g_params = setup
    wavs = [synth_utterance("BATCHED SESSION ONE", seed=6),
            synth_utterance("A LONGER SECOND LIVE SESSION", seed=7),
            synth_utterance("HI", seed=8)]

    eng = BatchedStreamingRecognizer(cfg, am_params, g_params=g_params,
                                     max_streams=4, **KW)
    slots = [eng.open() for _ in wavs]
    ids = {s: [] for s in slots}
    pos = [0] * len(wavs)
    while any(p < len(w) for p, w in zip(pos, wavs)):
        for i, (s, w) in enumerate(zip(slots, wavs)):
            if pos[i] < len(w):
                eng.feed(s, w[pos[i]: pos[i] + 5000])
                pos[i] += 5000
        got = eng.step()
        while got:
            for s, x in got.items():
                ids[s].extend(x)
            got = eng.step()
    for s in slots:
        eng.end_stream(s)
    got = eng.step()
    while got:
        for s, x in got.items():
            ids[s].extend(x)
        got = eng.step()

    for s, w in zip(slots, wavs):
        ref = StreamingRecognizer(cfg, am_params, g_params=g_params, **KW)
        ref_ids = ref.feed(w) + ref.flush()
        assert ids[s] == ref_ids
        assert eng.transcript(s) == ref.transcript()
        assert eng.is_done(s)


def test_rejects_unaligned_windows(setup):
    cfg, am_params, _ = setup
    with pytest.raises(ValueError):
        StreamingRecognizer(cfg, am_params, chunk_seconds=0.505)
    with pytest.raises(ValueError):
        # 0.01 s = 160 samples = ONE hop -> odd frame count, not stitchable.
        StreamingRecognizer(cfg, am_params, chunk_seconds=0.5,
                            history_seconds=0.01)


# -------------------------------------------- streaming-aware AM training

def test_am_blockwise_single_window_matches_full(setup):
    """One even-length window covering the whole utterance (no history or
    lookahead) must reproduce the offline AM forward exactly — the window is
    the same even-parity SAME-padding geometry, and the masked ops make the
    trailing pad frames inert."""
    from aas_enhancement_tpu.models.am import am_blockwise_apply

    cfg, am_params, _ = setup
    rng = np.random.default_rng(0)
    t, f = 40, cfg.audio.num_bins
    am_in = rng.standard_normal((2, t, f)).astype(np.float32)
    lengths = np.array([t, 29], np.int32)
    full, full_len = AcousticModel(cfg.am).apply(am_params, am_in, lengths)
    block, blk_len = am_blockwise_apply(cfg.am, am_params, am_in, lengths,
                                        chunk_f=48, look_f=0, hist_f=0)
    np.testing.assert_array_equal(np.asarray(blk_len), np.asarray(full_len))
    assert block.shape == full.shape
    np.testing.assert_allclose(np.asarray(block), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


def test_am_blockwise_shapes_and_masking(setup):
    from aas_enhancement_tpu.models.am import am_blockwise_apply

    cfg, am_params, _ = setup
    rng = np.random.default_rng(1)
    t, f = 53, cfg.audio.num_bins
    am_in = rng.standard_normal((2, t, f)).astype(np.float32)
    lengths = np.array([t, 20], np.int32)
    out, out_len = am_blockwise_apply(cfg.am, am_params, am_in, lengths,
                                      chunk_f=16, look_f=5, hist_f=8)
    assert out.shape == (2, -(-t // 2), cfg.am.vocab_size)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out_len), [27, 10])
    # Frames past out_lengths stay zero (apply_time_mask at the stitch).
    np.testing.assert_array_equal(np.asarray(out)[1, 10:], 0.0)


@pytest.mark.slow
def test_am_blockwise_matches_streaming_recognizer_frames(setup):
    """The training-time blockwise AM forward approximates the LIVE
    StreamingRecognizer emission: same frame count, high logit agreement in
    the interior (differences: running vs full-utterance normalization and
    the flush block's geometry).

    slow: compiles both the blockwise AM scan and the live recognizer
    program (~40 s — round-5 fast-tier rebalance, VERDICT r4 #7)."""
    cfg, am_params, _ = setup
    wav = synth_utterance("BLOCKWISE TRAINING MATCHES LIVE", seed=7)
    rec = StreamingRecognizer(cfg, am_params, chunk_seconds=1.0,
                              lookahead_seconds=0.5, history_seconds=0.5,
                              collect_logits=True)
    rec.feed(wav)
    rec.flush()
    live = rec.log_probs()

    from aas_enhancement_tpu.models.am import am_blockwise_apply
    from aas_enhancement_tpu.ops.masking import masked_normalize
    from aas_enhancement_tpu.train.objectives import device_features

    _, log_mag, fl = device_features(cfg, jnp.asarray(wav)[None],
                                     jnp.array([len(wav)], np.int32))
    am_in = masked_normalize(log_mag, fl)
    fps = cfg.audio.sample_rate // cfg.audio.hop_length
    logits, out_len = am_blockwise_apply(
        cfg.am, am_params, am_in, fl, chunk_f=int(1.0 * fps),
        look_f=int(0.5 * fps), hist_f=int(0.5 * fps))
    n = int(out_len[0])
    assert n == len(live)
    # Interior agreement (past the running-normalization warmup): the
    # training forward and the live emission see the same window geometry,
    # differing only in the normalization moments, so their log-probs must
    # correlate strongly once the running moments have converged.
    lp_blk = np.asarray(jax.nn.log_softmax(logits[0, :n], axis=-1))
    a, b = lp_blk[n // 2:].ravel(), live[n // 2:].ravel()
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.9, f"blockwise vs live interior log-prob corr {corr}"


def test_am_blockwise_rejects_odd_windows(setup):
    from aas_enhancement_tpu.models.am import am_blockwise_apply

    cfg, am_params, _ = setup
    am_in = np.zeros((1, 32, cfg.audio.num_bins), np.float32)
    lengths = np.array([32], np.int32)
    with pytest.raises(ValueError):
        am_blockwise_apply(cfg.am, am_params, am_in, lengths,
                           chunk_f=15, look_f=0, hist_f=0)
    with pytest.raises(ValueError):
        am_blockwise_apply(cfg.am, am_params, am_in, lengths,
                           chunk_f=16, look_f=0, hist_f=3)
