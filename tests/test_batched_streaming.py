"""Batched multi-stream serving: BatchedStreamingEnhancer runs N live streams
through ONE jitted program per tick and must reproduce each stream's
single-stream StreamingEnhancer output (TPU-first serving — concurrent
streams batch together to fill the MXU; SURVEY.md §3.3 enhancement entry
point, BASELINE.json:5 streaming north star)."""

import jax
import numpy as np
import pytest

from aas_enhancement_tpu.config import Config, EnhancerConfig
from aas_enhancement_tpu.data.synthetic import synth_utterance
from aas_enhancement_tpu.streaming import (BatchedStreamingEnhancer,
                                           StreamingEnhancer)
from aas_enhancement_tpu.enhance import init_enhancer


@pytest.fixture(scope="module")
def setup():
    cfg = Config(enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=16, rnn_layers=1))
    params = init_enhancer(cfg, jax.random.key(0))
    return cfg, params


def single_stream_reference(cfg, params, wav, **kw):
    eng = StreamingEnhancer(cfg, params, **kw)
    return np.concatenate([eng.feed(wav), eng.flush()])


def drain(eng, outs):
    got = eng.step()
    while got:
        for s, y in got.items():
            outs[s].append(y)
        got = eng.step()


def test_batched_matches_single_stream(setup):
    """Three concurrent streams of different lengths + content, interleaved
    pushes, == each one's independent single-stream output."""
    cfg, params = setup
    kw = dict(chunk_seconds=0.5, lookahead_seconds=0.1, history_seconds=0.5)
    wavs = [synth_utterance("HELLO BATCHED WORLD", seed=10),
            synth_utterance("A DIFFERENT LONGER SENTENCE HERE OK", seed=11),
            synth_utterance("SHORT", seed=12)]

    eng = BatchedStreamingEnhancer(cfg, params, max_streams=4, **kw)
    slots = [eng.open() for _ in wavs]
    outs = {s: [] for s in slots}
    pos = [0] * len(wavs)
    push = 4000
    while any(p < len(w) for p, w in zip(pos, wavs)):
        for s, w, i in zip(slots, wavs, range(len(wavs))):
            if pos[i] < len(w):
                eng.feed(s, w[pos[i]: pos[i] + push])
                pos[i] += push
        drain(eng, outs)
    for s in slots:
        eng.end_stream(s)
    drain(eng, outs)

    for s, w in zip(slots, wavs):
        got = np.concatenate(outs[s])
        ref = single_stream_reference(cfg, params, w, **kw)
        assert got.shape == ref.shape == w.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_slot_lifecycle_reuse(setup):
    """Closing a slot frees it; a new stream in the reused slot starts from
    fresh state (no history / running-moment leakage)."""
    cfg, params = setup
    kw = dict(chunk_seconds=0.25, lookahead_seconds=0.05,
              history_seconds=0.25)
    w1 = synth_utterance("FIRST STREAM", seed=20)
    w2 = synth_utterance("SECOND DISTINCT STREAM", seed=21)

    eng = BatchedStreamingEnhancer(cfg, params, max_streams=1, **kw)
    s1 = eng.open()
    with pytest.raises(RuntimeError):
        eng.open()                       # full
    eng.feed(s1, w1)
    eng.end_stream(s1)
    outs = {s1: []}
    drain(eng, outs)
    got1 = np.concatenate(outs[s1])
    eng.close(s1)

    s2 = eng.open()                      # reuses the freed slot
    eng.feed(s2, w2)
    eng.end_stream(s2)
    outs2 = {s2: []}
    drain(eng, outs2)
    got2 = np.concatenate(outs2[s2])

    np.testing.assert_allclose(
        got1, single_stream_reference(cfg, params, w1, **kw), atol=2e-5)
    np.testing.assert_allclose(
        got2, single_stream_reference(cfg, params, w2, **kw), atol=2e-5)


def test_stream_shorter_than_chunk(setup):
    """A stream that ends before filling one chunk flushes correctly."""
    cfg, params = setup
    kw = dict(chunk_seconds=1.0, lookahead_seconds=0.2, history_seconds=1.0)
    wav = (np.random.default_rng(5).standard_normal(3000) * 0.1
           ).astype(np.float32)
    eng = BatchedStreamingEnhancer(cfg, params, max_streams=2, **kw)
    s = eng.open()
    eng.feed(s, wav)
    eng.end_stream(s)
    outs = {s: []}
    drain(eng, outs)
    got = np.concatenate(outs[s])
    ref = single_stream_reference(cfg, params, wav, **kw)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
