"""ARPA n-gram file bridge: import KenLM-style word LMs, export ours.

Reference parity: the reference's ctcdecode consumes a KenLM WORD LM that users
train externally and hand over as an .arpa / binary file (SURVEY.md §2 "NATIVE:
ctcdecode").  KenLM itself is absent from this image, but the ARPA text format
is the lingua franca of n-gram tooling (KenLM, SRILM, IRSTLM all emit it), so
this module makes the rebuild interchangeable with that ecosystem:

- `ArpaWordLM.load_arpa(path)` reads an ARPA file and exposes the SAME fusion
  contract as `decode.lm.WordNGramLM` (is_word_lm / logp / oov_logp /
  export_native), so `evaluate --word-lm model.arpa` just works, python and
  native C++ beam alike.
- `export_arpa(word_lm, path)` writes a `WordNGramLM` out as a bigram ARPA
  file.  The round trip is exact to text-float precision (test_arpa.py).

Scope notes (documented, deliberate):
- The beam tracks ONE word of left context (the dense [(W+2), W] table the
  C++ decoder consumes — `WordNGramLM.export_native`), so ARPA orders > 2 are
  truncated to their 1-/2-gram sections on load; `self.order` records the
  file's true order and a warning field carries the truncation.
- ARPA stores log10 probabilities; everything here is converted to natural
  log at parse time (the fusion contract's unit).
- Words are case-folded to the label charset (labels.encode convention);
  vocabulary entries containing characters outside the charset are kept for
  context scoring but excluded from `export_native`'s word list — the CTC
  decoder can never emit them.
- Stupid backoff is not a normalized model, so `export_arpa` writes its
  constant per-context backoff weight (log10 0.4) as each unigram's backoff
  field — standard practice when interchanging stupid-backoff models.
"""

from __future__ import annotations

import math

import numpy as np

from aas_enhancement_tpu.labels import LABELS

_LN10 = math.log(10.0)
_BACKOFF = math.log(0.4)           # decode.lm's stupid-backoff penalty (ln)
_SPECIALS = ("<s>", "</s>", "<unk>")


class ArpaWordLM:
    """Word LM backed by an ARPA file, fused like `WordNGramLM`.

    Scoring contract (natural log):
      logp(w | prev)   explicit bigram if present, else backoff(prev) +
                       unigram(w); prev=None means sentence start (`<s>`).
      OOV words        flat `oov_logp` = backoff(<unk>) + P(<unk>) in every
                       context (the native table scores OOV flat — same
                       behavior as WordNGramLM.oov_logp).
    """

    is_word_lm = True

    def __init__(self, labels: str = LABELS):
        self.labels = labels
        self.order = 0
        self.truncated = False      # True when the file had orders > 2
        # word -> (logp_ln, backoff_ln); bigram (a, b) -> logp_ln
        self.uni: dict[str, tuple[float, float]] = {}
        self.bi: dict[tuple[str, str], float] = {}
        self._native = None

    # ------------------------------------------------------------- parsing
    @classmethod
    def load_arpa(cls, path: str, labels: str = LABELS) -> "ArpaWordLM":
        lm = cls(labels)
        section = 0                 # 0 = preamble, n = inside \n-grams:
        with open(path, encoding="utf-8", errors="replace") as f:
            lines = iter(f)
            for line in lines:
                if line.strip() == "\\data\\":
                    break
            else:
                raise ValueError(f"{path}: no \\data\\ section — not ARPA")
            for line in lines:
                s = line.strip()
                if not s:
                    continue
                if s == "\\end\\":
                    break
                if s.startswith("ngram "):
                    n = int(s[len("ngram "):].split("=")[0])
                    lm.order = max(lm.order, n)
                    continue
                if s.startswith("\\") and s.endswith("-grams:"):
                    section = int(s[1:].split("-")[0])
                    if section > 2:
                        lm.truncated = True
                    continue
                if section == 0 or section > 2:
                    continue
                fields = s.split()
                # logp  w1 [w2]  [backoff]
                logp = float(fields[0]) * _LN10
                words = fields[1:1 + section]
                rest = fields[1 + section:]
                backoff = float(rest[0]) * _LN10 if rest else 0.0
                words = [lm._fold(w) for w in words]
                if section == 1:
                    lm.uni[words[0]] = (logp, backoff)
                else:
                    lm.bi[(words[0], words[1])] = logp
        if not lm.uni:
            raise ValueError(f"{path}: no 1-grams parsed")
        return lm

    def _fold(self, word: str) -> str:
        lw = word.lower()
        return lw if lw in _SPECIALS else word.upper()

    # ------------------------------------------------------------- scoring
    @property
    def _unk_logp(self) -> float:
        ent = self.uni.get("<unk>")
        if ent is not None:
            return ent[0]
        # No <unk> entry: uniform floor under the vocabulary size.
        return -math.log(len(self.uni) + 1.0) + 2 * _BACKOFF

    @property
    def oov_logp(self) -> float:
        bo = self.uni.get("<unk>", (0.0, _BACKOFF))[1]
        return bo + self._unk_logp

    def _backoff_of(self, prev: str) -> float:
        ent = self.uni.get(prev)
        if ent is not None:
            return ent[1]
        return self.uni.get("<unk>", (0.0, _BACKOFF))[1]

    def logp(self, word: str, prev: str | None = None) -> float:
        """log P(word | prev), natural log; prev None = sentence start."""
        if not word:
            return 0.0
        w = self._fold(word)
        p = "<s>" if prev is None else self._fold(prev)
        if w not in self.uni:
            return self._backoff_of(p) + self._unk_logp
        hit = self.bi.get((p, w))
        if hit is not None:
            return hit
        return self._backoff_of(p) + self.uni[w][0]

    # ------------------------------------------------------- native export
    def export_native(self):
        """Same flat-array dict as `WordNGramLM.export_native` (the shared
        contract with native/ctc_beam/ctc_beam.cc and the python fallback)."""
        if self._native is not None:
            return self._native
        char_to_id = {c: i for i, c in enumerate(self.labels)}
        words = sorted(w for w in self.uni
                       if w not in _SPECIALS and w
                       and all(c in char_to_id for c in w))
        if not words:
            raise ValueError("ARPA LM has no words expressible in the "
                             f"label charset {self.labels!r}")
        n = len(words)
        ids, offsets = [], [0]
        for w in words:
            ids.extend(char_to_id[c] for c in w)
            offsets.append(len(ids))
        table = np.empty((n + 2, n), np.float32)
        unk_bo = self.uni.get("<unk>", (0.0, _BACKOFF))[1]
        for j, w in enumerate(words):
            table[n, j] = self.logp(w, prev=None)
            table[n + 1, j] = unk_bo + self.uni[w][0]   # OOV-prev row
        for i, p in enumerate(words):
            for j, w in enumerate(words):
                table[i, j] = self.logp(w, prev=p)
        id_words = {tuple(ids[offsets[i]: offsets[i + 1]]): i
                    for i in range(n)}
        self._native = {
            "word_ids": np.asarray(ids, np.int32),
            "word_offsets": np.asarray(offsets, np.int32),
            "n_words": n,
            "table": table,
            "oov_logp": float(self.oov_logp),
            "space_id": self.labels.index(" "),
            "words": words,
            "wid": {w: i for i, w in enumerate(words)},
            "id_words": id_words,
        }
        return self._native


def export_arpa(word_lm, path: str) -> None:
    """Write a trained `decode.lm.WordNGramLM` as a bigram ARPA file.

    The written file reloads through `ArpaWordLM.load_arpa` with scoring
    equal to the source model to text-float precision, for every case the
    fusion contract exercises: seen/unseen bigrams, sentence-initial words,
    OOV words, and the OOV-previous-context table row.
    """
    if not getattr(word_lm, "is_word_lm", False):
        raise ValueError("export_arpa needs a word LM (WordNGramLM)")
    words = sorted(word_lm.uni)
    bo10 = _BACKOFF / _LN10

    def f10(ln_value: float) -> str:
        return f"{ln_value / _LN10:.8f}"

    bigrams = []
    for w, c in sorted(word_lm.bos.items()):
        bigrams.append((f10(word_lm.logp(w, prev=None)), "<s>", w))
    for (a, b) in sorted(word_lm.bi):
        bigrams.append((f10(word_lm.logp(b, prev=a)), a, b))

    unk_logp = _BACKOFF - math.log(word_lm.total + len(word_lm.uni) + 1)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(words) + 3}\n")
        f.write(f"ngram 2={len(bigrams)}\n\n")
        f.write("\\1-grams:\n")
        f.write(f"{f10(unk_logp)}\t<unk>\t{bo10:.8f}\n")
        f.write(f"-99\t<s>\t{bo10:.8f}\n")
        f.write("-99\t</s>\n")
        for w in words:
            f.write(f"{f10(word_lm._uni_logp(w))}\t{w}\t{bo10:.8f}\n")
        f.write("\n\\2-grams:\n")
        for logp10, a, b in bigrams:
            f.write(f"{logp10}\t{a} {b}\n")
        f.write("\n\\end\\\n")
