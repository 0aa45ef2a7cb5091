"""ARPA n-gram file bridge: import KenLM-style word LMs, export ours.

Reference parity: the reference's ctcdecode consumes a KenLM WORD LM that users
train externally and hand over as an .arpa / binary file (SURVEY.md §2 "NATIVE:
ctcdecode").  KenLM itself is absent from this image, but the ARPA text format
is the lingua franca of n-gram tooling (KenLM, SRILM, IRSTLM all emit it), so
this module makes the rebuild interchangeable with that ecosystem:

- `ArpaWordLM.load_arpa(path)` reads an ARPA file of ANY order and exposes the
  SAME fusion contract as `decode.lm.WordNGramLM` (is_word_lm / logp /
  export_native), so `evaluate --word-lm model.arpa` just works, python and
  native C++ beam alike.  Every order in the file is kept: the sparse n-gram
  store (decode/ngram.py) replaces round-3's dense bigram table, the beam
  carries (order-1) words of left context, and memory is O(#n-grams) — a real
  KenLM trigram/4-gram over a 5k-50k-word vocabulary loads whole.
- `export_arpa(word_lm, path)` writes a `WordNGramLM` out as a bigram ARPA
  file.  The round trip is exact to text-float precision (test_arpa.py).

Scope notes (documented, deliberate):
- ARPA stores log10 probabilities; everything here is converted to natural
  log at parse time (the fusion contract's unit).
- Words are case-folded to the label charset (labels.encode convention);
  vocabulary entries containing characters outside the charset are kept for
  context scoring but excluded from the emittable lexicon — the CTC decoder
  can never emit them.
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
    """Word n-gram LM backed by an ARPA file, fused like `WordNGramLM`.

    Storage is LM-id space: `vocab` lists unigrams in file order (position =
    LM id), `uni_logp`/`uni_backoff` are dense [vlm] arrays, and `ngrams[n-2]`
    maps order-n id tuples -> (logp_ln, backoff_ln).  Scoring is standard ARPA
    backoff through `decode.ngram.score_export` — the exact arithmetic the
    native C++ decoder replays (shared contract, decode/ngram.py docstring).
    """

    is_word_lm = True

    def __init__(self, labels: str = LABELS):
        self.labels = labels
        self.order = 0
        self.vocab: list[str] = []
        self.wid: dict[str, int] = {}
        self.uni_logp: list[float] = []
        self.uni_backoff: list[float] = []
        self.ngrams: list[dict] = []      # per order n = 2..order
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
                    while len(lm.ngrams) < lm.order - 1:
                        lm.ngrams.append({})
                    continue
                if s.startswith("\\") and s.endswith("-grams:"):
                    section = int(s[1:].split("-")[0])
                    lm.order = max(lm.order, section)
                    while len(lm.ngrams) < lm.order - 1:
                        lm.ngrams.append({})
                    continue
                if section == 0:
                    continue
                fields = s.split()
                # logp  w1 ... wn  [backoff]
                logp = float(fields[0]) * _LN10
                words = [lm._fold(w) for w in fields[1:1 + section]]
                rest = fields[1 + section:]
                backoff = float(rest[0]) * _LN10 if rest else 0.0
                if section == 1:
                    w = words[0]
                    i = lm.wid.get(w)
                    if i is None:               # first sight defines the id
                        lm.wid[w] = len(lm.vocab)
                        lm.vocab.append(w)
                        lm.uni_logp.append(logp)
                        lm.uni_backoff.append(backoff)
                    else:                       # case-fold collision: last wins
                        lm.uni_logp[i] = logp
                        lm.uni_backoff[i] = backoff
                else:
                    ids = tuple(lm.wid.get(w, -1) for w in words)
                    if -1 in ids:
                        # Word never declared as a unigram (malformed file);
                        # an n-gram over it could never be looked up — drop.
                        continue
                    lm.ngrams[section - 2][ids] = (logp, backoff)
        if not lm.vocab:
            raise ValueError(f"{path}: no 1-grams parsed")
        return lm

    def _fold(self, word: str) -> str:
        lw = word.lower()
        return lw if lw in _SPECIALS else word.upper()

    # ------------------------------------------------------------- scoring
    @property
    def unk_id(self) -> int:
        return self.wid.get("<unk>", -1)

    @property
    def bos_id(self) -> int:
        return self.wid.get("<s>", -1)

    @property
    def floor_logp(self) -> float:
        """Score of a word absent even as a unigram when the model has no
        <unk>: uniform floor under the vocabulary size, fully backed off."""
        return -math.log(len(self.vocab) + 1.0) + 2 * _BACKOFF

    @property
    def oov_logp(self) -> float:
        """Flat OOV score in an empty context (back-compat diagnostic)."""
        u = self.unk_id
        if u >= 0:
            return self.uni_backoff[u] + self.uni_logp[u]
        return _BACKOFF + self.floor_logp

    def _lm_id(self, word: str | None) -> int:
        if word is None:
            return self.bos_id
        return self.wid.get(self._fold(word), self.unk_id)

    def logp(self, word: str, prev=None) -> float:
        """log P(word | prev), natural log.  `prev` is a single word, None
        (sentence start = `<s>` context), or a SEQUENCE of words oldest-first
        for higher-order contexts."""
        if not word:
            return 0.0
        from aas_enhancement_tpu.decode import ngram
        if prev is None or isinstance(prev, str):
            ctx = [self._lm_id(prev)]
        else:
            ctx = [self._lm_id(p) for p in prev]
        return ngram.score_export(self.export_native(), ctx,
                                  self._lm_id(word))

    # ------------------------------------------------------- native export
    def export_native(self):
        """Sparse-export dict (decode/ngram.py shared contract with
        native/ctc_beam/ctc_beam.cc and the python fallback); cached."""
        if self._native is None:
            from aas_enhancement_tpu.decode import ngram
            self._native = ngram.build_export(
                max(self.order, 1), self.vocab,
                np.asarray(self.uni_logp, np.float32),
                np.asarray(self.uni_backoff, np.float32),
                self.ngrams, labels=self.labels,
                space_id=self.labels.index(" "),
                floor_logp=self.floor_logp)
        return self._native


def export_arpa(word_lm, path: str) -> None:
    """Write a trained `decode.lm.WordNGramLM` as a bigram ARPA file.

    The written file reloads through `ArpaWordLM.load_arpa` with scoring
    equal to the source model to text-float precision, for every case the
    fusion contract exercises: seen/unseen bigrams, sentence-initial words,
    OOV words, and OOV previous contexts.
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
