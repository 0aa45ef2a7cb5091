"""ARPA bridge: KenLM-format word-LM import/export (decode/arpa.py).

Reference parity: the reference's ctcdecode consumes an externally trained
KenLM .arpa word LM (SURVEY.md §2 "NATIVE: ctcdecode"); these tests prove the
rebuild round-trips that format and fuses an ARPA LM identically to the
natively trained WordNGramLM."""

import math

import numpy as np
import pytest

from aas_enhancement_tpu.decode.arpa import ArpaWordLM, export_arpa
from aas_enhancement_tpu.decode.beam import beam_decode
from aas_enhancement_tpu.decode.lm import WordNGramLM, load_lm
from aas_enhancement_tpu.labels import encode

_LN10 = math.log(10.0)

TEXTS = ["THE CAT SAT", "THE CAT RAN", "THE DOG SAT", "A DOG RAN",
         "THE CAT SAT", "THE CAT SAT ON THE MAT"]


@pytest.fixture(scope="module")
def wlm():
    return WordNGramLM().fit_texts(TEXTS)


@pytest.fixture(scope="module")
def arpa_path(wlm, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arpa") / "word.arpa")
    export_arpa(wlm, path)
    return path


def test_handwritten_arpa_parses():
    """Known log10 values from a hand-written file, incl. a 3-gram section
    (kept in full — no order truncation) and an explicit <unk>."""
    text = """\
some header junk the parser must skip

\\data\\
ngram 1=5
ngram 2=2
ngram 3=1

\\1-grams:
-2.0\t<unk>\t-0.39794
-99\t<s>\t-0.30103
-99\t</s>
-0.60206\tcat\t-0.30103
-0.30103\tthe\t-0.30103

\\2-grams:
-0.30103\t<s> the
-0.17609\tthe cat

\\3-grams:
-0.1\t<s> the cat

\\end\\
"""
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".arpa")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    lm = ArpaWordLM.load_arpa(path)
    os.unlink(path)
    assert lm.order == 3
    assert not hasattr(lm, "truncated")      # the r3 truncation flag is gone
    # Explicit trigram, converted log10 -> ln (VERDICT r3 #1: orders > 2 are
    # no longer dropped).
    assert lm.logp("CAT", ("<s>", "THE")) == pytest.approx(
        -0.1 * _LN10, abs=1e-6)
    # Trigram backoff: (<s>, the, the) absent -> bo(<s> the)=0 (no backoff
    # field on that bigram) + P(the | the) = bo(the) + P1(the).
    assert lm.logp("THE", ("<s>", "THE")) == pytest.approx(
        (-0.30103 + -0.30103) * _LN10, abs=1e-6)
    # Explicit bigram, converted log10 -> ln.
    assert lm.logp("CAT", "THE") == pytest.approx(-0.17609 * _LN10, abs=1e-6)
    # Sentence-initial explicit bigram through prev=None.
    assert lm.logp("THE", None) == pytest.approx(-0.30103 * _LN10, abs=1e-6)
    # Backoff path: P(the | cat) = backoff(cat) + P1(the).
    assert lm.logp("THE", "CAT") == pytest.approx(
        (-0.30103 + -0.30103) * _LN10, abs=1e-6)
    # OOV word: backoff(prev) + P(<unk>).
    assert lm.logp("ZEBRA", "THE") == pytest.approx(
        (-0.30103 + -2.0) * _LN10, abs=1e-6)
    # Case folding: lowercase file words score as the uppercase charset words.
    assert lm.logp("cat", "the") == lm.logp("CAT", "THE")


def test_roundtrip_scoring_exact(wlm, arpa_path):
    lm2 = ArpaWordLM.load_arpa(arpa_path)
    words = sorted(wlm.uni) + ["ZEBRA"]          # ZEBRA = OOV
    for prev in [None] + sorted(wlm.uni):
        for w in words:
            if w in wlm.uni:
                assert wlm.logp(w, prev) == pytest.approx(
                    lm2.logp(w, prev), abs=1e-6), (prev, w)
    assert wlm.oov_logp == pytest.approx(lm2.oov_logp, abs=1e-6)


def test_roundtrip_native_fusion_exact(wlm, arpa_path):
    """The sparse exports of the source model and its ARPA round-trip score
    every fusion case identically (LM ids may differ — vocab order is
    construction-dependent — so compare through the scoring contract)."""
    from aas_enhancement_tpu.decode.beam import word_bonus
    ex1 = wlm.export_native()
    ex2 = ArpaWordLM.load_arpa(arpa_path).export_native()
    assert ex1["words"] == ex2["words"]
    assert ex1["space_id"] == ex2["space_id"]
    assert ex1["order"] == ex2["order"] == 2
    sp = ex1["space_id"]
    prefixes = [tuple(encode("THE")),                       # BOS word
                tuple(encode("THE CAT")),                   # seen bigram
                tuple(encode("CAT THE")),                   # unseen bigram
                tuple(encode("XYZQ CAT")),                  # OOV prev
                tuple(encode("THE XYZQ")),                  # OOV word
                tuple(encode("THE  CAT")),                  # space run
                tuple(encode("THE CAT ") ) + (sp,)]         # empty trailing
    for pre in prefixes:
        assert word_bonus(pre, 1.0, 0.0, ex1) == pytest.approx(
            word_bonus(pre, 1.0, 0.0, ex2), abs=1e-6), pre


def _corpus_logits(text, seed=0, noise=1.5):
    """Log-probs weakly favoring `text`, noisy enough that fusion matters."""
    from aas_enhancement_tpu.labels import LABELS
    rng = np.random.default_rng(seed)
    ids = encode(text)
    v = len(LABELS)
    logits = rng.standard_normal((2 * len(ids), v)).astype(np.float32) * noise
    for t, c in enumerate(ids):
        logits[2 * t, c] += 3.0
        logits[2 * t + 1, 0] += 3.0
    return logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))


def test_beam_fusion_matches_trained_lm(wlm, arpa_path):
    """beam_decode with the ARPA-loaded LM == with the source WordNGramLM."""
    lm2 = ArpaWordLM.load_arpa(arpa_path)
    for seed, text in enumerate(["THE CAT SAT", "A DOG RAN", "THE MAT"]):
        lp = _corpus_logits(text, seed=seed)[None]
        a = beam_decode(lp, beam_width=8, word_lm=wlm,
                        word_alpha=0.8, word_beta=0.5)[0]
        b = beam_decode(lp, beam_width=8, word_lm=lm2,
                        word_alpha=0.8, word_beta=0.5)[0]
        assert a == b


def test_load_lm_sniffs_arpa(arpa_path):
    lm = load_lm(arpa_path)
    assert getattr(lm, "is_word_lm", False)
    assert isinstance(lm, ArpaWordLM)


def test_out_of_charset_words_excluded(tmp_path):
    """Vocabulary entries the CTC decoder can never emit stay out of the
    native word list but still parse."""
    path = str(tmp_path / "mixed.arpa")
    with open(path, "w") as f:
        f.write("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                "-2.0\t<unk>\t-0.4\n"
                "-0.5\tcat\t-0.3\n"
                "-0.6\tcafé\t-0.3\n"     # é not in the charset
                "-0.7\tdog\t-0.3\n"
                "\n\\end\\\n")
    lm = ArpaWordLM.load_arpa(path)
    ex = lm.export_native()
    assert ex["words"] == ["CAT", "DOG"]


def test_arpa_native_matches_python(wlm, arpa_path):
    """Native C++ fusion through an ARPA-sourced table == python fallback
    (same contract as test_lm.test_word_lm_native_matches_python)."""
    from aas_enhancement_tpu.decode.beam import (beam_search_native,
                                                 beam_search_python)
    from aas_enhancement_tpu.labels import LABELS
    rng = np.random.default_rng(5)
    v = len(LABELS)
    ex = ArpaWordLM.load_arpa(arpa_path).export_native()
    for trial in range(3):
        logits = rng.standard_normal((24, v)).astype(np.float32) * 2.0
        logits[:, 1] += 1.0              # make spaces likely enough to matter
        lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
        kw = dict(beam_width=12, prune_k=8, word_ex=ex,
                  lm_alpha=0.7, lm_beta=0.3)
        nat = beam_search_native(lp, **kw)
        if nat is None:
            pytest.skip("native decoder unavailable")
        py = beam_search_python(lp, **kw)
        assert nat[0] == py[0], f"trial {trial}: {nat} vs {py}"
        assert nat[1] == pytest.approx(py[1], rel=1e-3, abs=5e-3)


# ------------------------------------------------------------ trigram fusion
# (VERDICT r3 #1: ARPA order >= 3 fused WITHOUT truncation, beam carrying
# order-1 words of left context, python == native)

def _write_trigram_arpa(path: str) -> None:
    """Trigram model where bigram context is USELESS for the third word:
    P(SAT | CAT) == P(RAN | CAT), but P(SAT | THE CAT) = 0.9 — only an
    order-3 beam context can prefer SAT after 'THE CAT'."""
    with open(path, "w") as f:
        f.write("\\data\\\n"
                "ngram 1=8\nngram 2=6\nngram 3=2\n\n"
                "\\1-grams:\n"
                "-2.0\t<unk>\t-0.4\n"
                "-99\t<s>\t-0.1\n"
                "-99\t</s>\n"
                "-0.5\tthe\t-0.1\n"
                "-0.9\ta\t-0.1\n"
                "-0.6\tcat\t-0.1\n"
                "-0.9\tsat\t-0.1\n"
                "-0.9\tran\t-0.1\n"
                "\n\\2-grams:\n"
                "-0.2\t<s> the\t-0.05\n"
                "-0.6\t<s> a\t-0.05\n"
                "-0.3\tthe cat\t-0.05\n"
                "-0.3\ta cat\t-0.05\n"
                "-0.30103\tcat sat\t0.0\n"     # P(sat|cat) == P(ran|cat)
                "-0.30103\tcat ran\t0.0\n"
                "\n\\3-grams:\n"
                "-0.04576\tthe cat sat\n"       # P(sat | the cat) ~ 0.9
                "-1.0\tthe cat ran\n"
                "\n\\end\\\n")


def _third_word_ambiguous_logits():
    """Acoustics: 'THE CAT' clear, then SAT vs RAN with RAN slightly ahead
    (chars S/R and T/N ambiguous so BOTH candidates are lexicon words —
    the bigram LM scores them identically, only the trigram separates)."""
    from aas_enhancement_tpu.labels import LABELS
    v = len(LABELS)
    ids = encode("THE CAT SAT")
    (r,) = encode("R")
    (n_id,) = encode("N")
    s_id, t_id = encode("S")[0], encode("T")[0]
    rows = []
    for i, c in enumerate(ids):
        row = np.full(v, -12.0, np.float32)
        if i == 8:                       # the S of SAT: R slightly ahead
            row[r] = math.log(0.52)
            row[s_id] = math.log(0.46)
        elif i == 10:                    # the T of SAT: N slightly ahead
            row[n_id] = math.log(0.52)
            row[t_id] = math.log(0.46)
        else:
            row[c] = 0.0
        rows.append(row)
        b = np.full(v, -12.0, np.float32)
        b[0] = 0.0
        rows.append(b)
    lp = np.stack(rows)
    return (lp - np.log(np.sum(np.exp(lp), axis=1,
                               keepdims=True))).astype(np.float32)


def test_trigram_context_rescues_where_bigram_cannot(tmp_path):
    """The order-3 context (THE CAT -> SAT) fixes a decode the bigram
    context (CAT -> 50/50) provably cannot — the measured capability the
    dense-table design lacked."""
    path = str(tmp_path / "tri.arpa")
    _write_trigram_arpa(path)
    tri = ArpaWordLM.load_arpa(path)
    assert tri.order == 3
    lp = _third_word_ambiguous_logits()[None]
    no_lm = beam_decode(lp, beam_width=8, word_lm=tri, word_alpha=0.0)[0]
    assert no_lm == "THE CAT RAN"
    fused = beam_decode(lp, beam_width=8, word_lm=tri, word_alpha=1.5)[0]
    assert fused == "THE CAT SAT", f"trigram fusion failed: {fused!r}"
    # The same model with its 3-gram section dropped (bigram knowledge only)
    # CANNOT break the SAT/RAN tie — the acoustic edge wins.
    bi = ArpaWordLM.load_arpa(path)
    bi.order = 2
    bi.ngrams = bi.ngrams[:1]
    bi._native = None
    fused_bi = beam_decode(lp, beam_width=8, word_lm=bi, word_alpha=1.5)[0]
    assert fused_bi != "THE CAT SAT"


def test_trigram_native_matches_python(tmp_path):
    """Native C++ fusion at order 3 == python fallback (ids exact, score
    approx), incl. contexts shorter than order-1 and BOS fill."""
    from aas_enhancement_tpu.decode.beam import (beam_search_native,
                                                 beam_search_python)
    from aas_enhancement_tpu.labels import LABELS
    path = str(tmp_path / "tri.arpa")
    _write_trigram_arpa(path)
    ex = ArpaWordLM.load_arpa(path).export_native()
    assert ex["order"] == 3
    rng = np.random.default_rng(11)
    v = len(LABELS)
    for trial in range(4):
        logits = rng.standard_normal((30, v)).astype(np.float32) * 2.0
        logits[:, 1] += 1.2              # spaces likely -> many word completions
        lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
        kw = dict(beam_width=12, prune_k=8, word_ex=ex,
                  word_alpha=0.9, word_beta=0.4)
        nat = beam_search_native(lp, **kw)
        if nat is None:
            pytest.skip("native decoder unavailable")
        py = beam_search_python(lp, **kw)
        assert nat[0] == py[0], f"trial {trial}: {nat} vs {py}"
        assert nat[1] == pytest.approx(py[1], rel=1e-3, abs=5e-3)
    # Determinism + the targeted rescue, native path included.
    lp = _third_word_ambiguous_logits()
    nat = beam_search_native(lp, 8, word_ex=ex, word_alpha=1.5)
    py = beam_search_python(lp, 8, word_ex=ex, word_alpha=1.5)
    assert nat[0] == py[0]


def test_fit_arpa_trains_and_roundtrips(tmp_path):
    """fit_arpa (any-order stupid-backoff trainer) -> save_arpa -> load_arpa:
    scoring exact to text-float precision at every order, and the MLE values
    are what counting says they should be."""
    from aas_enhancement_tpu.decode.arpa import fit_arpa
    texts = ["THE CAT SAT", "THE CAT RAN", "THE DOG SAT", "A CAT RAN",
             "THE CAT SAT", "A DOG SAT ON THE MAT"]
    lm = fit_arpa(texts, order=3)
    assert lm.order == 3
    # P(SAT | THE CAT) = 2/3 (THE CAT SAT x2, THE CAT RAN x1).
    assert lm.logp("SAT", ("THE", "CAT")) == pytest.approx(
        math.log(2 / 3), abs=1e-5)
    # P(RAN | A CAT) = 1 (explicit trigram).
    assert lm.logp("RAN", ("A", "CAT")) == pytest.approx(0.0, abs=1e-5)
    # Unseen trigram backs off: bo(DOG SAT) + P(SAT | SAT)-> unigram chain.
    assert lm.logp("THE", ("CAT", "SAT")) < lm.logp("SAT", ("THE", "CAT"))
    # Sentence-initial: (<s>, THE) bigram exists; (<s>, <s>, w) was skipped.
    assert lm.logp("THE", None) == pytest.approx(math.log(4 / 6), abs=1e-5)
    assert all("<s>" not in [lm.vocab[i] for i in ids[1:]]
               for ids in lm.ngrams[1])
    path = str(tmp_path / "tri_trained.arpa")
    lm.save_arpa(path)
    lm2 = ArpaWordLM.load_arpa(path)
    assert lm2.order == 3
    words = sorted(w for w in lm.vocab if not w.startswith("<"))
    for w in words + ["ZEBRA"]:
        for ctx in (None, "THE", ("THE", "CAT"), ("A", "DOG"), ("XQ", "CAT")):
            assert lm.logp(w, ctx) == pytest.approx(
                lm2.logp(w, ctx), abs=1e-6), (w, ctx)


def test_fit_arpa_fusion_native_matches_python():
    """A TRAINED trigram (fit_arpa) fuses identically on both decoders."""
    from aas_enhancement_tpu.decode.arpa import fit_arpa
    from aas_enhancement_tpu.decode.beam import (beam_search_native,
                                                 beam_search_python)
    from aas_enhancement_tpu.labels import LABELS
    texts = ["THE CAT SAT", "THE CAT RAN", "A DOG SAT", "THE DOG RAN"]
    ex = fit_arpa(texts, order=3).export_native()
    rng = np.random.default_rng(3)
    v = len(LABELS)
    for trial in range(3):
        logits = rng.standard_normal((26, v)).astype(np.float32) * 2.0
        logits[:, 1] += 1.0
        lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
        kw = dict(beam_width=10, prune_k=8, word_ex=ex,
                  word_alpha=0.8, word_beta=0.3)
        nat = beam_search_native(lp, **kw)
        if nat is None:
            pytest.skip("native decoder unavailable")
        py = beam_search_python(lp, **kw)
        assert nat[0] == py[0], f"trial {trial}"


def test_train_lm_cli_order3(tmp_path):
    """`train_lm --level word --order 3` writes an ARPA file that load_lm
    sniffs and evaluate can fuse (the KenLM-workflow CLI path)."""
    import csv
    from aas_enhancement_tpu.cli.train_lm import main as train_lm_main
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"")
    rows = []
    for i, text in enumerate(["THE CAT SAT", "THE CAT RAN", "A DOG SAT"]):
        t = tmp_path / f"{i}.txt"
        t.write_text(text)
        rows.append((str(wav), str(t)))
    manifest = tmp_path / "m.csv"
    with open(manifest, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    out = str(tmp_path / "tri.arpa")
    train_lm_main(["--manifest", str(manifest), "--level", "word",
                   "--order", "3", "--out", out])
    lm = load_lm(out)
    assert isinstance(lm, ArpaWordLM) and lm.order == 3
    assert lm.logp("SAT", ("THE", "CAT")) == pytest.approx(
        math.log(0.5), abs=1e-5)


# ---------------------------------------------------------- vocabulary scale
# (VERDICT r3 #1: the sparse store must handle a real KenLM-sized vocabulary
# within sane memory — the dense [(W+2), W] design needed ~100 MB at 5k words
# and ~10 GB at 50k; the hashed arrays are O(#n-grams))

def test_5k_vocab_trigram_loads_whole_and_fuses(tmp_path):
    """A 5,000-word trigram ARPA (60k bigrams + 60k trigrams) loads whole,
    exports < 8 MB of flat arrays, scores through full ARPA backoff, and the
    native C++ beam fuses it identically to python."""
    from aas_enhancement_tpu.decode import ngram
    from aas_enhancement_tpu.decode.beam import (beam_search_native,
                                                 beam_search_python)
    from aas_enhancement_tpu.labels import LABELS

    rng = np.random.default_rng(17)
    chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    words = set()
    while len(words) < 5000:
        n = int(rng.integers(4, 9))
        words.add("".join(chars[i] for i in rng.integers(0, 26, n)))
    words = sorted(words)
    uni10 = -math.log10(len(words)) - 0.2    # near-uniform unigrams
    pair_ids = rng.integers(0, 5000, (60000, 2))
    tri_ids = rng.integers(0, 5000, (60000, 3))

    path = str(tmp_path / "big.arpa")
    with open(path, "w") as f:
        f.write("\\data\\\nngram 1=5003\nngram 2=60000\nngram 3=60000\n\n")
        f.write("\\1-grams:\n-2.0\t<unk>\t-0.4\n-99\t<s>\t-0.1\n-99\t</s>\n")
        for w in words:
            f.write(f"{uni10:.4f}\t{w}\t-0.35\n")
        f.write("\n\\2-grams:\n")
        for a, b in pair_ids:
            f.write(f"{-1.0 - (a % 7) * 0.1:.4f}\t{words[a]} {words[b]}\t-0.2\n")
        f.write("\n\\3-grams:\n")
        for a, b, c in tri_ids:
            f.write(f"{-0.5 - (c % 5) * 0.1:.4f}\t{words[a]} {words[b]} {words[c]}\n")
        f.write("\n\\end\\\n")

    lm = ArpaWordLM.load_arpa(path)
    assert lm.order == 3 and len(lm.vocab) == 5003
    ex = lm.export_native()
    assert ex["n_words"] == 5000
    mb = ngram.export_nbytes(ex) / 2**20
    assert mb < 8.0, f"sparse export ballooned to {mb:.1f} MB"
    # Dense-table equivalent for comparison: (W+2) * W float32.
    dense_mb = (5002 * 5000 * 4) / 2**20
    assert dense_mb > 90.0                   # the design this replaced

    # Full-backoff scoring spot checks (duplicate rng rows may overwrite:
    # read the expected value back from the parsed model, then check the
    # export path reproduces it through every backoff branch).
    a, b, c = (int(x) for x in tri_ids[0])
    ids = (lm.wid[words[a]], lm.wid[words[b]], lm.wid[words[c]])
    expect = lm.ngrams[1][ids]
    got = ngram.score_export(ex, ids[:2], ids[2])
    assert got == pytest.approx(expect[0], abs=1e-5)
    # An unseen trigram over a seen bigram context backs off through it.
    unseen = ngram.score_export(ex, ids[:2], lm.wid[words[(c + 1) % 5000]])
    assert unseen < -0.1

    # Native == python fusion at 5k-word scale.
    v = len(LABELS)
    logits = rng.standard_normal((40, v)).astype(np.float32) * 2.0
    logits[:, 1] += 1.2
    lp = (logits - np.log(np.sum(np.exp(logits), axis=1,
                                 keepdims=True))).astype(np.float32)
    kw = dict(beam_width=12, prune_k=8, word_ex=ex,
              word_alpha=0.8, word_beta=0.3)
    nat = beam_search_native(lp, **kw)
    if nat is None:
        pytest.skip("native decoder unavailable")
    py = beam_search_python(lp, **kw)
    assert nat[0] == py[0]
    assert nat[1] == pytest.approx(py[1], rel=1e-3, abs=5e-3)
