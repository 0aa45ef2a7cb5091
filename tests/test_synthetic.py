"""The structured synthetic language + audio difficulty knobs (VERDICT r2 #1).

The corpus is the CHiME-4 stand-in (SURVEY.md §7 "Data absence"): transcripts
must carry n-gram structure an LM can exploit, and the audio knobs
(speaking-rate jitter, coarticulation, reverb, non-stationary noise) must
behave as documented so e2e difficulty is tunable."""

import os
from collections import Counter

import numpy as np

from aas_enhancement_tpu.data.synthetic import (apply_rir, default_language,
                                                generate_corpus, make_noise,
                                                make_rir, synth_utterance)


def test_language_deterministic_in_lang_seed():
    a, b = default_language(3), default_language(3)
    assert a.words == b.words
    np.testing.assert_array_equal(a.bigram, b.bigram)
    c = default_language(4)
    assert c.words != a.words


def test_language_bigram_structure():
    """Sentences must carry LEARNABLE word-transition structure: a bigram
    model fit on one sample assigns other samples far higher likelihood than
    a unigram-only model does (the gap an LM exploits at decode time)."""
    lang = default_language(0)
    rng = np.random.default_rng(1)
    train_words, test_words = [], []
    for _ in range(300):
        train_words.extend(lang.sample_sentence(rng, (3, 8)).split())
        test_words.extend(lang.sample_sentence(rng, (3, 8)).split())
    assert set(train_words) <= set(lang.words)

    uni = Counter(train_words)
    bi = Counter(zip(train_words, train_words[1:]))
    n_uni = sum(uni.values())

    def uni_lp(w):
        return np.log((uni.get(w, 0) + 1) / (n_uni + len(lang.words)))

    def bi_lp(prev, w):
        ctx_total = sum(c for (a, _), c in bi.items() if a == prev)
        c = bi.get((prev, w), 0)
        if ctx_total == 0 or c == 0:
            return np.log(0.4) + uni_lp(w)      # stupid backoff
        return np.log(c / ctx_total)

    pairs = list(zip(test_words, test_words[1:]))[:500]
    gap = np.mean([bi_lp(a, b) - uni_lp(b) for a, b in pairs])
    assert gap > 0.5, f"bigram carries no information over unigram: {gap:.3f}"


def test_rate_jitter_changes_durations():
    base = synth_utterance("HELLO WORLD", seed=1)
    same = synth_utterance("HELLO WORLD", seed=1)
    np.testing.assert_array_equal(base, same)        # deterministic
    jit = synth_utterance("HELLO WORLD", seed=1, rate_jitter=0.25)
    assert len(jit) != len(base)
    jit2 = synth_utterance("HELLO WORLD", seed=2, rate_jitter=0.25)
    assert len(jit2) != len(jit)                     # per-seed rates differ


def test_coarticulation_smooths_formant_transitions():
    """Coarticulated audio must differ from stepwise audio but keep the same
    length (smoothing is time-preserving)."""
    a = synth_utterance("ABAB", seed=3, coarticulation=0.0)
    b = synth_utterance("ABAB", seed=3, coarticulation=0.5)
    assert len(a) == len(b)
    assert float(np.max(np.abs(a - b))) > 0.01


def test_rir_properties():
    ir = make_rir(0.3, seed=2)
    assert abs(float(np.sum(ir ** 2)) - 1.0) < 1e-5   # unit energy
    assert np.argmax(np.abs(ir)) == 0                 # direct path first
    wav = synth_utterance("HELLO", seed=1)
    out = apply_rir(wav, ir)
    assert out.shape == wav.shape
    assert float(np.max(np.abs(out))) <= 1.0
    assert float(np.max(np.abs(out - wav))) > 1e-3    # actually reverberates


def test_nonstationary_noise():
    n = make_noise(32000, "nonstat", seed=3)
    assert abs(float(np.std(n)) - 1.0) < 1e-3
    # Frame-level energies must vary far more than stationary white noise.
    frames = n[: 32000 // 800 * 800].reshape(-1, 800)
    e = np.std(frames, axis=1)
    w = make_noise(32000, "white", seed=3)
    ew = np.std(w[: 32000 // 800 * 800].reshape(-1, 800), axis=1)
    assert float(np.std(e)) > 4 * float(np.std(ew))


def test_generate_corpus_structured(tmp_path):
    m = generate_corpus(str(tmp_path), n_utts=6, seed=5, reverb_prob=0.5)
    lang = default_language(0)
    lex = os.path.join(str(tmp_path), "lexicon.txt")
    assert open(lex).read().splitlines() == lang.words
    for line in open(m["noisy"]).read().splitlines():
        text = open(line.split(",")[1]).read()
        assert all(w in lang.words for w in text.split())


def test_generate_corpus_legacy_unchanged(tmp_path):
    """vocab_chars / explicit word_len keep the rounds-1/2 uniform-char
    transcripts (unit tests + throughput bench pin this workload)."""
    m = generate_corpus(str(tmp_path), n_utts=4, seed=11, vocab_chars=6)
    assert not os.path.exists(os.path.join(str(tmp_path), "lexicon.txt"))
    texts = [open(line.split(",")[1]).read()
             for line in open(m["noisy"]).read().splitlines()]
    allowed = set("ABCDE'")   # first 6 non-space labels
    assert all(set(t) <= allowed | {" "} for t in texts)


def test_corpora_share_language_but_not_sentences(tmp_path):
    a = generate_corpus(str(tmp_path / "a"), n_utts=8, seed=1)
    b = generate_corpus(str(tmp_path / "b"), n_utts=8, seed=2)
    ta = {open(line.split(",")[1]).read()
          for line in open(a["noisy"]).read().splitlines()}
    tb = {open(line.split(",")[1]).read()
          for line in open(b["noisy"]).read().splitlines()}
    # Short high-probability sentences may coincide (real language does too);
    # the splits must still be MOSTLY disjoint for held-out evaluation.
    assert len(ta & tb) <= len(ta) // 4, f"too much overlap: {ta & tb}"
    lang = default_language(0)
    for t in ta | tb:
        assert all(w in lang.words for w in t.split())


def test_language_trigram_structure():
    """tri_classes > 1 plants GENUINE order-3 dependence (VERDICT r3 #1): a
    trigram LM fit on samples beats a bigram LM on held-out likelihood by a
    clear margin — and that margin is specific to the trigram language (on a
    tri_classes=1 language the two models are near-identical)."""
    from aas_enhancement_tpu.decode.arpa import fit_arpa

    def tri_gain(tri_classes, lang_seed=5):
        from aas_enhancement_tpu.data.synthetic import Language
        lang = Language(lang_seed=lang_seed, tri_classes=tri_classes)
        rng = np.random.default_rng(2)
        train = [lang.sample_sentence(rng, (4, 9)) for _ in range(500)]
        rng2 = np.random.default_rng(9)
        test = [lang.sample_sentence(rng2, (4, 9)) for _ in range(120)]
        bi = fit_arpa(train, order=2)
        tri = fit_arpa(train, order=3)

        def mean_ll(lm):
            tot, n = 0.0, 0
            for s in test:
                padded = ["<s>"] + s.split()
                for t in range(1, len(padded)):
                    ctx = padded[max(0, t - (lm.order - 1)): t]
                    tot += lm.logp(padded[t], ctx)
                    n += 1
            return tot / n

        return mean_ll(tri) - mean_ll(bi)

    gain_tri = tri_gain(3)
    gain_flat = tri_gain(1)
    assert gain_tri > 0.15, f"trigram language not learnable: {gain_tri:.3f}"
    assert gain_tri > gain_flat + 0.1, (gain_tri, gain_flat)


def test_language_tri_classes_default_unchanged():
    """tri_classes=1 draws NOTHING extra from the language RNG: words,
    unigram, and bigram are bit-identical to the rounds-1-3 construction,
    and sentence sampling consumes the corpus RNG identically."""
    a = default_language(0)
    b = default_language(0, tri_classes=3)
    assert a.words == b.words
    np.testing.assert_array_equal(a.unigram, b.unigram)
    np.testing.assert_array_equal(a.bigram, b.bigram)
    assert a.tri_bigram is None and b.tri_bigram is not None
    # A 2-word sentence never reaches the trigram branch: identical draws.
    assert (a.sample_sentence(np.random.default_rng(0), (2, 2))
            == b.sample_sentence(np.random.default_rng(0), (2, 2)))
