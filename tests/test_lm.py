"""Char n-gram LM + beam-search shallow fusion (SURVEY.md §2 "NATIVE: ctcdecode"
— the reference decodes beam + KenLM; the rebuild's scorer is a char n-gram)."""

import math

import numpy as np
import pytest

from aas_enhancement_tpu.decode.beam import (beam_search_native,
                                             beam_search_python, beam_decode)
from aas_enhancement_tpu.decode.lm import CharNGramLM, context_index
from aas_enhancement_tpu.labels import LABELS, encode


@pytest.fixture(scope="module")
def lm():
    texts = ["THE CAT SAT ON THE MAT", "THE DOG ATE THE FOOD",
             "A CAT AND A DOG", "THE THEME OF THE DAY"] * 3
    return CharNGramLM(order=3).fit_texts(texts)


def test_lm_probabilities_normalize(lm):
    table = lm.dense_table()
    v = len(LABELS)
    assert table.shape == (v * v, v)
    # For a context that was observed with no backoff need, probs sum to <= 1
    # and the top continuation is the corpus continuation: "TH" -> "E".
    t, h, e = encode("THE")
    ctx = context_index([t, h], 3, v)
    assert int(np.argmax(table[ctx])) == e
    # Observed rows are proper distributions over their seen support.
    seen = np.exp(table[ctx])
    assert seen.sum() <= 1.5  # backoff floor mass can push slightly over 1


def test_context_index_contract():
    v = len(LABELS)
    # BOS padding with 0
    assert context_index([], 3, v) == 0
    assert context_index([5], 3, v) == 5
    assert context_index([5, 7], 3, v) == 5 * v + 7
    assert context_index([1, 5, 7], 3, v) == 5 * v + 7  # only last order-1 kept
    assert context_index([9, 9], 1, v) == 0


def test_save_load_roundtrip(lm, tmp_path):
    path = str(tmp_path / "lm.json")
    lm.save(path)
    lm2 = CharNGramLM.load(path)
    np.testing.assert_allclose(lm.dense_table(), lm2.dense_table(), rtol=1e-6)


def _ambiguous_logits(lm):
    """Acoustically ambiguous evidence: 'TH?' where ? is slightly in favor of Q
    over E.  The LM knows 'THE'; alpha>0 must rescue the decode."""
    v = len(LABELS)
    t, h, e = encode("THE")
    (q,) = encode("Q")
    blank = 0
    logits = np.full((6, v), -12.0, np.float32)
    logits[0, t] = 0.0
    logits[1, blank] = 0.0
    logits[2, h] = 0.0
    logits[3, blank] = 0.0
    logits[4, q] = math.log(0.52)
    logits[4, e] = math.log(0.46)
    logits[5, blank] = 0.0
    # normalize rows to proper log-probs
    lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
    return lp.astype(np.float32), (t, h, e, q)


def test_lm_rescues_ambiguous_decode(lm):
    lp, (t, h, e, q) = _ambiguous_logits(lm)
    no_lm = beam_decode(lp[None], beam_width=8)[0]
    assert no_lm == "THQ"
    fused = beam_decode(lp[None], beam_width=8, lm=lm, lm_alpha=0.8)[0]
    assert fused == "THE", f"LM fusion failed to rescue: {fused!r}"


def test_native_matches_python_with_lm(lm):
    rng = np.random.default_rng(3)
    v = len(LABELS)
    logits = rng.standard_normal((20, v)).astype(np.float32) * 2.0
    lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
    table = lm.dense_table()
    kw = dict(beam_width=12, prune_k=8, lm_table=table, lm_order=lm.order,
              lm_alpha=0.6, lm_beta=0.1)
    nat = beam_search_native(lp, **kw)
    assert nat is not None, "native decoder unavailable"
    py = beam_search_python(lp, **kw)
    assert nat[0] == py[0]
    assert nat[1] == pytest.approx(py[1], rel=1e-4)


def test_beam_decode_beta_bonus_lengthens(lm):
    """A large per-symbol insertion bonus must not crash and tends to prefer
    longer hypotheses (sanity of the beta path)."""
    rng = np.random.default_rng(0)
    v = len(LABELS)
    logits = rng.standard_normal((15, v)).astype(np.float32)
    lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
    short = beam_decode(lp[None], beam_width=8, lm=lm, lm_alpha=0.01,
                        lm_beta=-2.0)[0]
    long = beam_decode(lp[None], beam_width=8, lm=lm, lm_alpha=0.01,
                       lm_beta=2.0)[0]
    assert len(long) >= len(short)


# ---------------------------------------------------------------- word LM
# (the faithful ctcdecode+KenLM stand-in: fusion per COMPLETED word)

@pytest.fixture(scope="module")
def wlm():
    from aas_enhancement_tpu.decode.lm import WordNGramLM
    texts = ["THE CAT SAT", "THE CAT RAN", "THE DOG SAT", "A DOG RAN",
             "THE CAT SAT", "THE CAT SAT"]
    return WordNGramLM().fit_texts(texts)


def test_word_lm_scoring(wlm):
    # Seen bigram beats backoff; BOS distribution favors THE.
    assert wlm.logp("SAT", "CAT") > wlm.logp("RAN", "DOG")
    assert wlm.logp("THE") > wlm.logp("A")
    # OOV words get the flat floor in every context.
    assert wlm.logp("XYZ", "THE") == pytest.approx(wlm.oov_logp)
    assert wlm.logp("XYZ") == pytest.approx(wlm.oov_logp)
    # Seen-context rows are proper distributions over their support.
    total = sum(math.exp(wlm.logp(w, "CAT")) for w in ("SAT", "RAN"))
    assert total == pytest.approx(1.0)


def test_word_lm_save_load_roundtrip(wlm, tmp_path):
    from aas_enhancement_tpu.decode.lm import WordNGramLM, load_lm
    path = str(tmp_path / "wlm.json")
    wlm.save(path)
    lm2 = load_lm(path)
    assert isinstance(lm2, WordNGramLM)
    for w, p in [("SAT", "CAT"), ("THE", None), ("XYZ", "THE")]:
        assert lm2.logp(w, p) == pytest.approx(wlm.logp(w, p))
    ex1, ex2 = wlm.export_native(), lm2.export_native()
    np.testing.assert_array_equal(ex1["ngram_keys"], ex2["ngram_keys"])
    np.testing.assert_allclose(ex1["ngram_logp"], ex2["ngram_logp"], rtol=1e-6)
    np.testing.assert_allclose(ex1["uni_logp"], ex2["uni_logp"], rtol=1e-6)


def test_load_lm_dispatches_char(lm, tmp_path):
    from aas_enhancement_tpu.decode.lm import load_lm
    path = str(tmp_path / "clm.json")
    lm.save(path)
    assert isinstance(load_lm(path), CharNGramLM)


def _word_ambiguous_logits():
    """Acoustic evidence slightly favors 'THE CAU' over 'THE CAT'; the word LM
    knows CAT and must rescue the decode at the space/final boundary."""
    v = len(LABELS)
    ids = encode("THE CAT")
    (u,) = encode("U")
    blank = 0
    rows = []
    for i, c in enumerate(ids):
        row = np.full(v, -12.0, np.float32)
        if i == len(ids) - 1:            # last char: T vs U, U slightly ahead
            row[u] = math.log(0.52)
            row[c] = math.log(0.46)
        else:
            row[c] = 0.0
        rows.append(row)
        b = np.full(v, -12.0, np.float32)
        b[blank] = 0.0
        rows.append(b)
    lp = np.stack(rows)
    return (lp - np.log(np.sum(np.exp(lp), axis=1, keepdims=True))).astype(
        np.float32)


def test_word_lm_rescues_final_word(wlm):
    lp = _word_ambiguous_logits()
    no_lm = beam_decode(lp[None], beam_width=8)[0]
    assert no_lm == "THE CAU"
    fused = beam_decode(lp[None], beam_width=8, lm=wlm, lm_alpha=1.0)[0]
    assert fused == "THE CAT", f"word-LM fusion failed: {fused!r}"


def test_word_lm_native_matches_python(wlm):
    rng = np.random.default_rng(5)
    v = len(LABELS)
    ex = wlm.export_native()
    for trial in range(4):
        logits = rng.standard_normal((24, v)).astype(np.float32) * 2.0
        logits[:, 1] += 1.0              # make spaces likely enough to matter
        lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
        kw = dict(beam_width=12, prune_k=8, word_ex=ex,
                  lm_alpha=0.7, lm_beta=0.3)
        nat = beam_search_native(lp, **kw)
        assert nat is not None, "native decoder unavailable"
        py = beam_search_python(lp, **kw)
        assert nat[0] == py[0], f"trial {trial}: {nat} vs {py}"
        assert nat[1] == pytest.approx(py[1], rel=1e-3, abs=5e-3)


def test_word_bonus_boundary_cases(wlm):
    from aas_enhancement_tpu.decode.beam import word_bonus
    ex = wlm.export_native()
    sp = ex["space_id"]
    cat = tuple(encode("CAT"))
    the = tuple(encode("THE"))
    # Empty trailing segment (ends with space / empty prefix) scores 0.
    assert word_bonus((), 1.0, 0.5, ex) == 0.0
    assert word_bonus(the + (sp,), 1.0, 0.5, ex) == 0.0
    # Sentence-initial word uses the BOS row.
    assert word_bonus(the, 1.0, 0.0, ex) == pytest.approx(wlm.logp("THE"))
    # Mid-sentence word conditions on the previous word.
    assert word_bonus(the + (sp,) + cat, 1.0, 0.0, ex) == pytest.approx(
        wlm.logp("CAT", "THE"))
    # Runs of spaces collapse: prev is still THE.
    assert word_bonus(the + (sp, sp) + cat, 1.0, 0.0, ex) == pytest.approx(
        wlm.logp("CAT", "THE"))
    # OOV word: flat floor + beta.
    xyz = tuple(encode("XYZ"))
    assert word_bonus(the + (sp,) + xyz, 1.0, 0.25, ex) == pytest.approx(
        wlm.oov_logp + 0.25)


def test_from_manifests(tmp_path):
    import csv
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"")
    txts = []
    for i, text in enumerate(["HELLO WORLD", "HELLO AGAIN"]):
        t = tmp_path / f"{i}.txt"
        t.write_text(text)
        txts.append(t)
    manifest = tmp_path / "m.csv"
    with open(manifest, "w", newline="") as f:
        w = csv.writer(f)
        for t in txts:
            w.writerow([str(wav), str(t)])
    lm = CharNGramLM.from_manifests(str(manifest), order=2)
    h, e = encode("HE")
    assert lm.logp(e, [h]) > lm.logp(encode("Z")[0], [h])


def test_grid_search_lm_picks_winning_point(tmp_path, wlm):
    """decode/tune.py: the grid must include the no-LM anchor, and on logits
    where fusion helps, the tuned point must not be worse than no-LM."""
    from aas_enhancement_tpu.decode.tune import wer_at
    from aas_enhancement_tpu.decode.wer import corpus_wer

    lp = _word_ambiguous_logits()
    refs = ["THE CAT"]
    lps = [lp]
    w_no = wer_at(refs, lps, None, 0.0, 0.0, beam_width=8)
    w_best = None
    for a in (0.5, 1.0):
        for b in (0.0, 0.5):
            w = wer_at(refs, lps, wlm, a, b, beam_width=8)
            w_best = w if w_best is None else min(w_best, w)
    assert w_no > 0.0            # the ambiguous final word is wrong without LM
    assert w_best == 0.0         # fusion rescues it somewhere on the grid


# ------------------------------------------------------------ hybrid fusion
# (char LM per symbol + word LM per completed word, separate weights — the
# measured-best decode mode, BASELINE.md round 3)

def test_hybrid_native_matches_python(lm, wlm):
    rng = np.random.default_rng(7)
    v = len(LABELS)
    ex, ct = wlm.export_native(), lm.dense_table()
    for trial in range(4):
        logits = rng.standard_normal((24, v)).astype(np.float32) * 2.0
        logits[:, 1] += 1.0
        lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
        kw = dict(beam_width=12, prune_k=8, lm_table=ct, lm_order=lm.order,
                  lm_alpha=0.8, lm_beta=0.4, word_ex=ex,
                  word_alpha=0.6, word_beta=0.2)
        nat = beam_search_native(lp, **kw)
        assert nat is not None, "native decoder unavailable"
        py = beam_search_python(lp, **kw)
        assert nat[0] == py[0], f"trial {trial}: {nat} vs {py}"
        assert nat[1] == pytest.approx(py[1], rel=1e-3, abs=5e-3)


def test_hybrid_reduces_to_single_lm(lm, wlm):
    """Zero word weight == char-only; zero char weight == word-only
    (python fallback and native both)."""
    rng = np.random.default_rng(9)
    v = len(LABELS)
    logits = rng.standard_normal((20, v)).astype(np.float32) * 2.0
    lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
    ex, ct = wlm.export_native(), lm.dense_table()
    for search in (beam_search_python, beam_search_native):
        char_only = search(lp, 8, prune_k=8, lm_table=ct, lm_order=lm.order,
                           lm_alpha=0.9, lm_beta=0.3)
        hybrid_c = search(lp, 8, prune_k=8, lm_table=ct, lm_order=lm.order,
                          lm_alpha=0.9, lm_beta=0.3, word_ex=ex,
                          word_alpha=0.0, word_beta=0.0)
        assert char_only[0] == hybrid_c[0]
        assert char_only[1] == pytest.approx(hybrid_c[1], abs=1e-4)
        word_only = search(lp, 8, prune_k=8, word_ex=ex,
                           lm_alpha=0.7, lm_beta=0.2)          # back-compat
        word_kw = search(lp, 8, prune_k=8, word_ex=ex,
                         word_alpha=0.7, word_beta=0.2)        # explicit
        assert word_only[0] == word_kw[0]
        assert word_only[1] == pytest.approx(word_kw[1], abs=1e-4)


def test_hybrid_beam_decode_rescues(lm, wlm):
    """beam_decode(lm=char, word_lm=word): the word LM rescues the final word
    while the char LM is active (both fused)."""
    lp = _word_ambiguous_logits()
    out = beam_decode(lp[None], beam_width=8, lm=lm, lm_alpha=0.2,
                      lm_beta=0.0, word_lm=wlm, word_alpha=1.0)[0]
    assert out == "THE CAT", f"hybrid fusion failed: {out!r}"


def test_hybrid_rejects_two_word_lms(wlm):
    lp = _word_ambiguous_logits()
    with pytest.raises(ValueError):
        beam_decode(lp[None], lm=wlm, lm_alpha=0.5, word_lm=wlm,
                    word_alpha=0.5)


# ------------------------------------------------------------ edge refine

def test_edge_refine_escapes_clipped_grid():
    """decode/tune.edge_refine: when the true optimum lies OUTSIDE the grid
    on both axes (the round-5 live-hybrid situation — the best point sat on
    the alpha AND beta maxima), alternating outward steps must walk to it."""
    from aas_enhancement_tpu.decode.tune import edge_refine

    opt = (2.8, 2.5)
    calls = []

    def wer(a, b):
        calls.append((a, b))
        return 0.01 * ((a - opt[0]) ** 2 + (b - opt[1]) ** 2)

    alphas = (0.3, 0.6, 1.0, 1.5)
    betas = (-0.5, 0.0, 0.5, 1.0)
    # coarse best = the grid corner nearest the optimum
    a0, b0 = 1.5, 1.0
    w0 = wer(a0, b0)
    grid = []
    a, b, w = edge_refine(wer, a0, b0, w0, alphas, betas,
                          grid=grid, max_evals=20)
    assert (a, b) != (a0, b0), "refinement never left the clipped corner"
    assert abs(a - opt[0]) <= 0.51 and abs(b - opt[1]) <= 0.51, (a, b)
    assert w < w0
    assert len(grid) == len(calls) - 1          # every refine eval recorded
    assert len(grid) <= 20


def test_edge_refine_interior_optimum_noop():
    """A best point in the grid interior triggers no extra decodes."""
    from aas_enhancement_tpu.decode.tune import edge_refine

    calls = []

    def wer(a, b):
        calls.append((a, b))
        return abs(a - 0.6) + abs(b - 0.0)

    a, b, w = edge_refine(wer, 0.6, 0.0, 0.0, (0.3, 0.6, 1.0),
                          (-0.5, 0.0, 0.5))
    assert (a, b, w) == (0.6, 0.0, 0.0)
    assert calls == []


def test_edge_refine_negative_beta_edge():
    """A best point on the beta MINIMUM extends downward."""
    from aas_enhancement_tpu.decode.tune import edge_refine

    def wer(a, b):
        return abs(a - 0.6) + abs(b + 1.5)

    a, b, w = edge_refine(wer, 0.6, -0.5, wer(0.6, -0.5),
                          (0.3, 0.6, 1.0), (-0.5, 0.0, 0.5), max_evals=10)
    assert b == pytest.approx(-1.5)
    assert a == 0.6
