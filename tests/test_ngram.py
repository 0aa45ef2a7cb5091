"""Sparse n-gram word-LM store (decode/ngram.py) — the scalable KenLM-parity
fusion contract (VERDICT r3 #1): hashing, build, ARPA-backoff scoring, and the
O(#ngrams) memory scaling that replaces the dense O(W^2) table."""

import math

import numpy as np
import pytest

from aas_enhancement_tpu.decode import ngram
from aas_enhancement_tpu.labels import LABELS


def test_hash_batch_matches_scalar():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 5):
        mat = rng.integers(-1, 60_000, size=(200, n)).astype(np.int64)
        batch = ngram.hash_ids_batch(mat)
        for row, h in zip(mat, batch):
            assert int(h) == ngram.hash_ids(row)


def test_hash_order_sensitivity():
    assert ngram.hash_ids([1, 2]) != ngram.hash_ids([2, 1])
    assert ngram.hash_ids([1]) != ngram.hash_ids([1, 1])
    # -1 (invalid id) hashes differently from 0 and from absence.
    assert ngram.hash_ids([-1]) != ngram.hash_ids([0])
    assert ngram.hash_ids([-1]) != ngram.hash_ids([])


def _tiny_export():
    """Hand-built trigram model over vocab [<s>, <unk>, CAT, DOG, THE]."""
    vocab = ["<s>", "<unk>", "CAT", "DOG", "THE"]
    wid = {w: i for i, w in enumerate(vocab)}
    uni_logp = [-99.0, -5.0, -1.2, -1.5, -0.7]
    uni_backoff = [-0.4, -0.3, -0.5, -0.6, -0.2]
    bi = {
        (wid["<s>"], wid["THE"]): (-0.3, -0.25),
        (wid["THE"], wid["CAT"]): (-0.5, -0.35),
        (wid["THE"], wid["DOG"]): (-0.9, 0.0),
    }
    tri = {
        (wid["<s>"], wid["THE"], wid["CAT"]): (-0.2, 0.0),
    }
    ex = ngram.build_export(3, vocab, uni_logp, uni_backoff, [bi, tri],
                            labels=LABELS, space_id=LABELS.index(" "),
                            floor_logp=-20.0)
    return ex, wid


def test_score_explicit_trigram():
    ex, wid = _tiny_export()
    s = ngram.score_export(ex, [wid["<s>"], wid["THE"]], wid["CAT"])
    assert s == pytest.approx(-0.2, abs=1e-6)


def test_score_backoff_to_bigram():
    ex, wid = _tiny_export()
    # (<s>, THE, DOG) absent -> bo(<s>, THE) + P(DOG | THE).
    s = ngram.score_export(ex, [wid["<s>"], wid["THE"]], wid["DOG"])
    assert s == pytest.approx(-0.25 + -0.9, abs=1e-6)


def test_score_backoff_to_unigram():
    ex, wid = _tiny_export()
    # (THE, CAT, DOG) absent, (CAT, DOG) absent:
    # bo(THE, CAT) + bo(CAT) + P(DOG).
    s = ngram.score_export(ex, [wid["THE"], wid["CAT"]], wid["DOG"])
    assert s == pytest.approx(-0.35 + -0.5 + -1.5, abs=1e-6)


def test_score_missing_context_charges_nothing():
    ex, wid = _tiny_export()
    # Context (DOG, CAT) has no stored bigram -> its backoff weight is 0;
    # bo(CAT) then applies at the unigram hop.
    s = ngram.score_export(ex, [wid["DOG"], wid["CAT"]], wid["THE"])
    assert s == pytest.approx(0.0 + -0.5 + -0.7, abs=1e-6)


def test_score_invalid_ids():
    ex, wid = _tiny_export()
    # Invalid (-1) context word: (-1, THE, CAT) misses, bo((-1, THE)) = 0
    # (invalid ids charge nothing), then the (THE, CAT) bigram HITS.
    s = ngram.score_export(ex, [-1, wid["THE"]], wid["CAT"])
    assert s == pytest.approx(-0.5, abs=1e-6)


def test_score_oov_word_floor():
    ex, wid = _tiny_export()
    # w = -1 (model without <unk> usable): every hop charges its backoff.
    s = ngram.score_export(ex, [wid["THE"]], -1)
    assert s == pytest.approx(-0.2 + -20.0, abs=1e-6)


def test_context_trimming():
    ex, wid = _tiny_export()
    long_ctx = [wid["DOG"], wid["<s>"], wid["THE"]]  # order-1 = 2 kept
    assert ngram.score_export(ex, long_ctx, wid["CAT"]) == pytest.approx(
        ngram.score_export(ex, long_ctx[1:], wid["CAT"]), abs=1e-12)


def test_lexicon_lookup():
    ex, wid = _tiny_export()
    cat = tuple(LABELS.index(c) for c in "CAT")
    assert ngram.lookup_word(ex, cat) == wid["CAT"]
    xyz = tuple(LABELS.index(c) for c in "XYZ")
    assert ngram.lookup_word(ex, xyz) == wid["<unk>"]
    # Specials are not emittable lexicon entries.
    assert "<s>" not in ex["words"] and "<unk>" not in ex["words"]
    assert ex["words"] == ["CAT", "DOG", "THE"]


def test_export_memory_scales_with_ngrams_not_vocab_squared():
    """A 5k-word vocabulary must stay megabytes, not the dense table's
    ~100 MB (VERDICT r3 #1 'sane memory' requirement)."""
    rng = np.random.default_rng(7)
    n_words = 5000
    vocab = ["<s>", "<unk>"] + ["W" + _base26(i) for i in range(n_words)]
    vlm = len(vocab)
    uni_logp = rng.uniform(-12, -3, vlm)
    uni_backoff = rng.uniform(-1, 0, vlm)
    n_bi, n_tri = 200_000, 100_000
    bi_ids = rng.integers(2, vlm, size=(n_bi, 2)).astype(np.int64)
    tri_ids = rng.integers(2, vlm, size=(n_tri, 3)).astype(np.int64)
    bi = {tuple(row): (-1.0, -0.4) for row in bi_ids}
    tri = {tuple(row): (-0.8, 0.0) for row in tri_ids}
    ex = ngram.build_export(3, vocab, uni_logp, uni_backoff, [bi, tri],
                            labels=LABELS, space_id=LABELS.index(" "))
    nbytes = ngram.export_nbytes(ex)
    n_ngrams = len(bi) + len(tri)
    assert nbytes < 32 * n_ngrams + 64 * vlm, "export is not O(#ngrams)"
    assert nbytes < 20e6, f"5k-word trigram export is {nbytes/1e6:.1f} MB"
    # Dense [(W+2), W] would be ~100 MB: prove the margin.
    dense_bytes = 4 * (n_words + 2) * n_words
    assert nbytes < dense_bytes / 5
    # Lookups still work at this scale.
    some = tuple(LABELS.index(c) for c in vocab[500])
    assert ngram.lookup_word(ex, some) == 500


def _base26(i: int) -> str:
    s = ""
    for _ in range(6):
        s += chr(ord("A") + (i % 26))
        i //= 26
    return s


def test_export_order_above_native_cap_fails_loudly():
    """ARPA order > kMaxOrder (C++ stack-buffer bound) must raise at export
    build time, not silently demote decodes to the python path (ADVICE r4)."""
    vocab = ["<s>", "<unk>", "CAT"]
    bad_order = ngram.NATIVE_MAX_ORDER + 1
    with pytest.raises(ValueError, match="native decoder's maximum"):
        ngram.build_export(bad_order, vocab, [-1.0] * 3, [0.0] * 3,
                           [{}] * (bad_order - 1), labels=LABELS,
                           space_id=LABELS.index(" "))
