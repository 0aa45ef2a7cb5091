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
