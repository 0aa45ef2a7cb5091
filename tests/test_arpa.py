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
    """Known log10 values from a hand-written file, incl. a truncated
    3-gram section and an explicit <unk>."""
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
    assert lm.order == 3 and lm.truncated
    # Explicit bigram, converted log10 -> ln.
    assert lm.logp("CAT", "THE") == pytest.approx(-0.17609 * _LN10, abs=1e-9)
    # Sentence-initial explicit bigram through prev=None.
    assert lm.logp("THE", None) == pytest.approx(-0.30103 * _LN10, abs=1e-9)
    # Backoff path: P(the | cat) = backoff(cat) + P1(the).
    assert lm.logp("THE", "CAT") == pytest.approx(
        (-0.30103 + -0.30103) * _LN10, abs=1e-9)
    # OOV word: backoff(prev) + P(<unk>).
    assert lm.logp("ZEBRA", "THE") == pytest.approx(
        (-0.30103 + -2.0) * _LN10, abs=1e-9)
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


def test_roundtrip_native_table_exact(wlm, arpa_path):
    ex1 = wlm.export_native()
    ex2 = ArpaWordLM.load_arpa(arpa_path).export_native()
    assert ex1["words"] == ex2["words"]
    assert ex1["space_id"] == ex2["space_id"]
    np.testing.assert_array_equal(ex1["word_ids"], ex2["word_ids"])
    np.testing.assert_array_equal(ex1["word_offsets"], ex2["word_offsets"])
    np.testing.assert_allclose(ex1["table"], ex2["table"], atol=1e-6)
    assert ex1["oov_logp"] == pytest.approx(ex2["oov_logp"], abs=1e-6)


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
