"""TPU-native batched beam search vs the python reference decoder.

Parity contract (decode/device_beam.py): ids match beam_search_python
EXACTLY on non-degenerate inputs; scores agree to float32 rounding (the
device decoder accumulates in f32, python in f64) — the same contract the
C++ decoder is held to (tests/test_beam.py).
"""

import numpy as np
import pytest

from aas_enhancement_tpu.decode.beam import beam_decode, beam_search_python
from aas_enhancement_tpu.decode.device_beam import (device_beam_decode,
                                                    device_beam_decode_raw)
from aas_enhancement_tpu.decode.lm import CharNGramLM
from aas_enhancement_tpu.labels import LABELS

V = len(LABELS)


def _batch_log_probs(b, t, seed=0, peaky=2.0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, V)).astype(np.float32) * peaky
    return (logits
            - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True)))


def _assert_parity(lp, lens, **kw):
    ids, olens, scores = device_beam_decode_raw(lp, lens, **kw)
    for b in range(lp.shape[0]):
        ref_ids, ref_score = beam_search_python(
            lp[b, : lens[b]],
            beam_width=kw.get("beam_width", 32),
            prune_k=kw.get("prune_k", 16),
            lm_table=kw.get("lm_table"), lm_order=kw.get("lm_order", 0),
            lm_alpha=kw.get("lm_alpha", 0.0), lm_beta=kw.get("lm_beta", 0.0))
        assert list(ids[b, : olens[b]]) == list(ref_ids), f"row {b} ids"
        np.testing.assert_allclose(scores[b], ref_score, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(3))
def test_device_matches_python_no_lm(seed):
    lp = _batch_log_probs(3, 40, seed=seed)
    lens = np.array([40, 25, 33], np.int32)
    _assert_parity(lp, lens, beam_width=16, prune_k=8)


def test_device_matches_python_no_prune():
    lp = _batch_log_probs(2, 40, seed=11)
    lens = np.array([40, 17], np.int32)
    _assert_parity(lp, lens, beam_width=16, prune_k=0)


def test_device_matches_python_peaky_ctc_like():
    """Blank-dominated, peaked rows — the regime real CTC logits live in,
    which stresses the prefix-merge path (many alignments per prefix)."""
    lp = _batch_log_probs(2, 40, seed=3, peaky=4.0)
    lp[:, ::2, 0] += 6.0  # blank dominates every other frame
    lp = lp - np.log(np.sum(np.exp(lp), axis=-1, keepdims=True))
    lens = np.array([40, 31], np.int32)
    _assert_parity(lp.astype(np.float32), lens, beam_width=16, prune_k=8)


@pytest.mark.parametrize("order", [2, 3])
def test_device_char_lm_fusion_matches_python(order):
    lm = CharNGramLM(order=order).fit_texts(
        ["the cat sat on the mat", "she sells sea shells",
         "how now brown cow"] * 2)
    table = lm.dense_table()
    lp = _batch_log_probs(2, 40, seed=order)
    lens = np.array([40, 28], np.int32)
    _assert_parity(lp, lens, beam_width=16, prune_k=8, lm_table=table,
                   lm_order=order, lm_alpha=0.7, lm_beta=0.2)


def test_device_strings_match_host_decoder():
    """String interface: device decode == beam_decode (host) end to end."""
    lp = _batch_log_probs(3, 40, seed=5)
    lens = np.array([40, 22, 35], np.int32)
    dev = device_beam_decode(lp, lens, beam_width=16, prune_k=8)
    host = beam_decode(lp, lens, beam_width=16, prune_k=8)
    assert dev == host


def test_degenerate_short_and_single_frame():
    lp = _batch_log_probs(2, 40, seed=9)
    lens = np.array([1, 2], np.int32)
    _assert_parity(lp, lens, beam_width=16, prune_k=8)


def test_lm_table_shape_validated():
    lp = _batch_log_probs(1, 40, seed=0)
    bad = np.zeros((V + 1, V), np.float32)  # not V^(order-1) rows
    with pytest.raises(ValueError, match="contexts"):
        device_beam_decode(lp, None, beam_width=8, lm_table=bad, lm_order=2,
                           lm_alpha=0.5)


@pytest.mark.slow
def test_evaluate_wer_device_decoder_matches_beam(tmp_path):
    """evaluate_wer plumbing: decoder='device' produces the same hypotheses
    (hence the same WER) as the host beam path on an untrained tiny AM."""
    import jax
    from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                            EnhancerConfig, TrainConfig)
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.evaluation import evaluate_wer
    from aas_enhancement_tpu.train.loop import init_state

    corpus = generate_corpus(str(tmp_path), n_utts=4, seed=3, vocab_chars=6)
    cfg = Config(am=AMConfig(rnn_hidden=16, rnn_layers=1, conv_channels=8),
                 enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=16, rnn_layers=1),
                 train=TrainConfig(objective="am", batch_size=2))
    state = init_state(cfg, jax.random.key(0))
    kw = dict(batch_size=2, beam_width=8)
    r_beam = evaluate_wer(cfg, state.am_params, corpus["noisy"],
                          decoder="beam", **kw)
    r_dev = evaluate_wer(cfg, state.am_params, corpus["noisy"],
                         decoder="device", **kw)
    assert r_dev["wer"] == r_beam["wer"]
    assert r_dev["sample_hyp"] == r_beam["sample_hyp"]


def test_evaluate_wer_device_rejects_word_lm():
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.evaluation import evaluate_wer

    with pytest.raises(ValueError, match="char-LM"):
        evaluate_wer(Config(), {}, manifest=None, decoder="device",
                     word_lm=object())
