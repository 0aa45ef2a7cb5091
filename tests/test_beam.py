"""CTC beam search: native C++ vs python reference vs greedy (SURVEY.md §2
"NATIVE: ctcdecode" rebuild obligation)."""

import numpy as np
import pytest

from aas_enhancement_tpu.decode.beam import (beam_decode, beam_search_native,
                                             beam_search_python)
from aas_enhancement_tpu.labels import LABELS


def _rand_log_probs(t, v, seed=0, peaky=2.0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((t, v)).astype(np.float32) * peaky
    lp = logits - np.log(np.sum(np.exp(logits), axis=1, keepdims=True))
    return lp.astype(np.float32)


def test_native_lib_builds_and_loads():
    lp = _rand_log_probs(10, 8)
    result = beam_search_native(lp, beam_width=8)
    assert result is not None, "native decoder failed to build/load"
    ids, score = result
    assert isinstance(ids, list) and np.isfinite(score)


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_python(seed):
    """Same beams, same pruning -> identical decodes (scores to float tolerance)."""
    lp = _rand_log_probs(20, 10, seed=seed)
    ids_n, score_n = beam_search_native(lp, beam_width=16, prune_k=0)
    ids_p, score_p = beam_search_python(lp, beam_width=16, prune_k=0)
    assert ids_n == ids_p
    np.testing.assert_allclose(score_n, score_p, rtol=1e-4, atol=1e-4)


def test_beam_no_worse_than_greedy():
    """Beam score must be >= the greedy path's prefix score."""
    for seed in range(5):
        lp = _rand_log_probs(15, 6, seed=seed, peaky=1.0)
        _, score_b = beam_search_python(lp, beam_width=32, prune_k=0)
        # Greedy path total prob (collapse-equivalent prefix) is a lower bound on
        # the best prefix probability found by a wide-enough beam.
        greedy_path_lp = float(np.sum(np.max(lp, axis=1)))
        assert score_b >= greedy_path_lp - 1e-3


def test_exact_sum_on_tiny_case():
    """Beam wide enough == exact marginalization over alignments."""
    import itertools
    lp = _rand_log_probs(4, 3, seed=7)
    ids, score = beam_search_python(lp, beam_width=10_000, prune_k=0)

    # Brute-force: total probability of each collapsed sequence.
    totals = {}
    for path in itertools.product(range(3), repeat=4):
        collapsed, prev = [], None
        for p in path:
            if p != 0 and p != prev:
                collapsed.append(p)
            prev = p
        key = tuple(collapsed)
        lp_path = sum(lp[i, p] for i, p in enumerate(path))
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp_path)
    best_key = max(totals, key=totals.get)
    assert tuple(ids) == best_key
    np.testing.assert_allclose(score, totals[best_key], rtol=1e-4, atol=1e-4)


def test_beam_decode_strings():
    a = LABELS.index("A")
    b = LABELS.index("B")
    t, v = 6, len(LABELS)
    lp = np.full((t, v), -10.0, np.float32)
    for i, c in enumerate([a, a, 0, b, b, 0]):
        lp[i, c] = -0.01
    out = beam_decode(lp[None], beam_width=8)
    assert out == ["AB"]


def _toy_lms():
    from aas_enhancement_tpu.decode.lm import CharNGramLM, WordNGramLM
    texts = ["THE CAT SAT", "A DOG RAN FAR", "THE DOG SAT ON A CAT",
             "A CAT RAN"] * 3
    clm = CharNGramLM(order=3).fit_texts(texts)
    wlm = WordNGramLM().fit_texts(texts)
    return clm, wlm


def test_batch_decode_matches_single_all_modes():
    """Thread-parallel batch entry point == per-utterance native calls,
    every fusion mode (none/char/word/hybrid), ragged lengths."""
    from aas_enhancement_tpu.decode.beam import beam_search_native_batch
    clm, wlm = _toy_lms()
    rng = np.random.default_rng(3)
    b, t, v = 6, 40, len(LABELS)
    lp = np.stack([_rand_log_probs(t, v, seed=i) for i in range(b)])
    lens = rng.integers(15, t + 1, b).astype(np.int32)
    modes = {
        "none": dict(),
        "char": dict(lm_table=clm.dense_table(), lm_order=clm.order,
                     lm_alpha=1.0, lm_beta=0.5),
        "word": dict(word_ex=wlm.export_native(), word_alpha=0.8,
                     word_beta=0.3),
        "hybrid": dict(lm_table=clm.dense_table(), lm_order=clm.order,
                       lm_alpha=1.0, lm_beta=0.5,
                       word_ex=wlm.export_native(), word_alpha=0.8,
                       word_beta=0.3),
    }
    for name, kw in modes.items():
        batch = beam_search_native_batch(lp, lens, beam_width=12,
                                         prune_k=8, **kw)
        if batch is None:
            pytest.skip("native decoder unavailable")
        for i in range(b):
            single = beam_search_native(lp[i, :lens[i]], 12, prune_k=8, **kw)
            assert batch[i][0] == single[0], (name, i)
            np.testing.assert_allclose(batch[i][1], single[1], atol=1e-5,
                                       err_msg=name)


def test_batch_decode_thread_count_invariant():
    """Decodes are identical for any n_threads (rows are independent)."""
    from aas_enhancement_tpu.decode.beam import beam_search_native_batch
    clm, wlm = _toy_lms()
    lp = np.stack([_rand_log_probs(40, len(LABELS), seed=i) for i in range(5)])
    lens = np.full(5, 40, np.int32)
    kw = dict(lm_table=clm.dense_table(), lm_order=clm.order, lm_alpha=1.0,
              lm_beta=0.5, word_ex=wlm.export_native(), word_alpha=0.8,
              word_beta=0.3)
    base = beam_search_native_batch(lp, lens, beam_width=12, **kw)
    if base is None:
        pytest.skip("native decoder unavailable")
    for nt in (1, 3, 8):
        r = beam_search_native_batch(lp, lens, beam_width=12, n_threads=nt,
                                     **kw)
        assert [x[0] for x in r] == [x[0] for x in base], nt


def test_beam_decode_uses_batch_path_identically():
    """beam_decode on a [B, T, V] batch == per-row beam_decode calls (the
    batched fast path must be behavior-invisible)."""
    clm, wlm = _toy_lms()
    lp = np.stack([_rand_log_probs(30, len(LABELS), seed=i) for i in range(4)])
    lens = np.array([30, 22, 30, 17], np.int32)
    kw = dict(beam_width=12, lm=clm, lm_alpha=1.0, lm_beta=0.5, word_lm=wlm,
              word_alpha=0.8, word_beta=0.3)
    batched = beam_decode(lp, lens, **kw)
    per_row = [beam_decode(lp[i][None], lens[i:i + 1], **kw)[0]
               for i in range(4)]
    assert batched == per_row


def test_decode_path_never_builds_implicitly(monkeypatch):
    """Loading/decoding must never shell out to make (VERDICT r3 #5):
    compiling belongs to the explicit build() entry point only."""
    import subprocess

    import aas_enhancement_tpu.decode.beam as beam_mod

    def forbid(*args, **kwargs):
        raise AssertionError(f"decode path invoked subprocess.run({args[0]!r})")

    monkeypatch.setattr(subprocess, "run", forbid)
    # Force a fresh library-load attempt with subprocess forbidden.
    monkeypatch.setattr(beam_mod, "_lib", None)
    monkeypatch.setattr(beam_mod, "_lib_tried", False)
    lp = _rand_log_probs(6, 5)
    out = beam_decode(lp[None], beam_width=4)
    assert len(out) == 1


def test_stale_abi_library_refused(tmp_path, monkeypatch):
    """A library reporting the wrong ABI version (or none) must be refused:
    binding the current argtypes to old code would silently corrupt decodes
    (ADVICE r4 medium).  Decode falls back to the python implementation."""
    import shutil
    import subprocess

    import aas_enhancement_tpu.decode.beam as beam_mod

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ not available")
    src = tmp_path / "stale.cc"
    src.write_text('extern "C" int ctc_beam_abi_version() { return 1; }\n')
    so = tmp_path / "libctcbeam.so"
    subprocess.run([gxx, "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    monkeypatch.setattr(beam_mod, "_LIB_PATH", str(so))
    monkeypatch.setattr(beam_mod, "_lib", None)
    monkeypatch.setattr(beam_mod, "_lib_tried", False)
    assert beam_mod._load_lib() is None
    # Pre-versioning build: the symbol is absent entirely -> also refused.
    src.write_text('extern "C" int ctc_beam_search() { return -1; }\n')
    subprocess.run([gxx, "-shared", "-fPIC", "-o", str(so), str(src)],
                   check=True)
    monkeypatch.setattr(beam_mod, "_lib", None)
    monkeypatch.setattr(beam_mod, "_lib_tried", False)
    assert beam_mod._load_lib() is None
    # The decode path still works on the python fallback.
    lp = _rand_log_probs(6, 5)
    out = beam_decode(lp[None], beam_width=4)
    assert len(out) == 1
    # And the real library (module defaults) passes the check.
    monkeypatch.undo()
    beam_mod._lib, beam_mod._lib_tried = None, False
    assert beam_mod.available()
