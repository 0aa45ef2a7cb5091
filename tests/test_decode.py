"""Greedy decode + WER (SURVEY.md §4 item 1: hand-built collapse/blank cases)."""

import jax.numpy as jnp
import pytest
import numpy as np

from aas_enhancement_tpu.decode.greedy import decode_batch, greedy_decode
from aas_enhancement_tpu.decode.wer import cer, corpus_wer, edit_distance, wer
from aas_enhancement_tpu.labels import LABELS


def _logits_from_ids(ids, v=29):
    """One-hot-ish logits that argmax to the given id sequence."""
    t = len(ids)
    out = np.zeros((t, v), np.float32)
    for i, c in enumerate(ids):
        out[i, c] = 5.0
    return out


def test_collapse_and_blank():
    # argmax path: A A _ A B B _  -> "AABB" collapses to "ABA"? No:
    # A A -> A; _ ; A -> A; B B -> B  => "AAB" -> string "A A B" = "AAB"
    a, b = LABELS.index("A"), LABELS.index("B")
    path = [a, a, 0, a, b, b, 0]
    logits = jnp.asarray(_logits_from_ids(path))[None]
    pads = jnp.zeros((1, len(path)))
    ids, counts = greedy_decode(logits, pads)
    assert int(counts[0]) == 3
    assert decode_batch(logits, pads) == ["AAB"]


def test_padding_ignored():
    a = LABELS.index("A")
    path = [a, 0, a, a, a]  # last 3 frames padded
    logits = jnp.asarray(_logits_from_ids(path))[None]
    pads = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 1.0]])
    assert decode_batch(logits, pads) == ["A"]


def test_empty_output():
    logits = jnp.asarray(_logits_from_ids([0, 0, 0]))[None]
    pads = jnp.zeros((1, 3))
    ids, counts = greedy_decode(logits, pads)
    assert int(counts[0]) == 0
    assert decode_batch(logits, pads) == [""]


def test_edit_distance_vs_levenshtein_pkg():
    try:
        import Levenshtein
    except ImportError:
        import pytest
        pytest.skip("Levenshtein not installed")
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = "".join(rng.choice(list("ABCD "), size=rng.integers(0, 12)))
        b = "".join(rng.choice(list("ABCD "), size=rng.integers(0, 12)))
        assert edit_distance(list(a), list(b)) == Levenshtein.distance(a, b)


def test_wer_cer():
    assert wer("THE CAT SAT", "THE CAT SAT") == 0.0
    assert wer("THE CAT SAT", "THE BAT SAT") == 1 / 3
    assert wer("A B", "") == 1.0
    assert cer("ABC", "ABD") == 1 / 3
    assert corpus_wer(["A B", "C D"], ["A B", "C X"]) == 0.25


def test_corpus_wer_ci():
    from aas_enhancement_tpu.decode.wer import corpus_wer_ci
    refs = ["A B", "C D", "E F", "G H"] * 12
    hyps = ["A B", "C X", "E F", "G H"] * 12
    point, lo, hi = corpus_wer_ci(refs, hyps, seed=1)
    assert point == corpus_wer(refs, hyps)
    assert 0.0 <= lo <= point <= hi <= 1.0
    assert hi > lo                       # non-degenerate interval
    # Deterministic in seed; perfect hypotheses give a degenerate zero CI.
    assert corpus_wer_ci(refs, hyps, seed=1) == (point, lo, hi)
    assert corpus_wer_ci(refs, refs, seed=2) == (0.0, 0.0, 0.0)
    assert corpus_wer_ci([], []) == (0.0, 0.0, 0.0)


def test_si_snr_metric():
    """SI-SNR: scale-invariant, +inf-ish for identical, low for noise."""
    import numpy as np

    from aas_enhancement_tpu.evaluation import si_snr

    rng = np.random.default_rng(0)
    ref = rng.standard_normal(16000).astype(np.float32)
    assert si_snr(ref, ref) > 50.0
    noisy = ref + rng.standard_normal(16000).astype(np.float32)
    mid = si_snr(noisy, ref)
    assert -5.0 < mid < 10.0
    # Scale invariance (on an imperfect estimate — a perfect one is limited
    # by float rounding, which scaling perturbs).
    assert abs(si_snr(0.3 * noisy, ref) - mid) < 1e-3
    assert si_snr(rng.standard_normal(16000), ref) < mid


def test_stoi_metric():
    """STOI: ~1 on identity, monotone in SNR, low for unrelated noise, and
    invariant to a global gain on the degraded signal."""
    from aas_enhancement_tpu.evaluation import stoi

    rng = np.random.default_rng(3)
    t = np.arange(32000) / 16000.0
    # Speech-ish reference: AM-modulated harmonics (STOI needs envelope
    # structure inside its 150 Hz-4.3 kHz third-octave bands).
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t)
    ref = env * (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 880 * t)
                 + 0.25 * np.sin(2 * np.pi * 1760 * t))

    assert stoi(ref, ref) > 0.99
    noise = rng.standard_normal(len(ref))
    snr10 = stoi(ref + 0.1 * noise, ref)
    snr0 = stoi(ref + 1.0 * noise, ref)
    snr_neg = stoi(ref + 3.0 * noise, ref)
    assert 1.0 > snr10 > snr0 > snr_neg
    assert stoi(noise, ref) < 0.35
    assert abs(stoi(0.25 * (ref + noise), ref) - stoi(ref + noise, ref)) < 1e-6

    with pytest.raises(ValueError):
        stoi(ref[:1000], ref[:1000])  # < one 384 ms active segment
