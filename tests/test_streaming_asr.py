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
