"""WER / CER via Levenshtein edit distance (reference Decoder.wer/cer parity,
SURVEY.md §2 "Greedy decoder + WER")."""

from __future__ import annotations


def edit_distance(a: list, b: list) -> int:
    """Levenshtein distance between two sequences (O(len(a)*len(b)) DP)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def wer(ref: str, hyp: str) -> float:
    """Word error rate of hyp against ref."""
    ref_words = ref.split()
    if not ref_words:
        return 0.0 if not hyp.split() else 1.0
    return edit_distance(ref_words, hyp.split()) / len(ref_words)


def cer(ref: str, hyp: str) -> float:
    if not ref:
        return 0.0 if not hyp else 1.0
    return edit_distance(list(ref), list(hyp)) / len(ref)


def corpus_wer(refs: list[str], hyps: list[str]) -> float:
    """Corpus-level WER: total word edits / total ref words."""
    edits, words = 0, 0
    for r, h in zip(refs, hyps):
        edits += edit_distance(r.split(), h.split())
        words += len(r.split())
    return edits / max(words, 1)
