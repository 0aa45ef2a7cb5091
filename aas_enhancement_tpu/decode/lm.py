"""Character n-gram language model for CTC beam-search shallow fusion.

Reference parity: the reference's `ctcdecode` fuses a KenLM word LM into its C++
beam search (SURVEY.md §2 "NATIVE: ctcdecode", rebuild obligation #3).  KenLM is
absent from this image, so the stand-in is a char n-gram LM trained from the
training manifests — same decoder-side interface (alpha = LM weight, beta =
insertion bonus), testable end-to-end.

The scorer is exported as a DENSE table logp[ctx, c] of shape [V^(order-1), V]
(stupid-backoff smoothing baked in at build time).  With the 29-char CTC vocab
this is 24 KB at order 3 and 2.8 MB at order 4 — small enough to hand to the
native C++ decoder as a flat float array, which keeps the hot decode loop
branch-free (one table lookup per beam extension).

Context indexing (shared contract with native/ctc_beam/ctc_beam.cc): the context
is the last (order-1) symbol ids, big-endian (oldest id in the highest digit):
    ctx = ((... (id_oldest) * V + ...) * V + id_newest)
padded at BOS with the blank id 0 — blank never appears inside a decoded prefix,
so 0 unambiguously means "sentence start" here.
"""

from __future__ import annotations

import json
import math

import numpy as np

from aas_enhancement_tpu.labels import LABELS, encode

_BACKOFF = math.log(0.4)   # stupid backoff penalty per order dropped


class CharNGramLM:
    """Char n-gram LM with stupid-backoff, dense-table export."""

    def __init__(self, order: int = 3, labels: str = LABELS):
        if order < 1:
            raise ValueError("order must be >= 1")
        self.order = order
        self.labels = labels
        # counts[m] maps context-tuple (length m) -> np.array[V] of counts.
        self.counts: list[dict[tuple, np.ndarray]] = [
            {} for _ in range(order)]
        self._table: np.ndarray | None = None

    # ------------------------------------------------------------- training
    def fit_texts(self, texts) -> "CharNGramLM":
        v = len(self.labels)
        for text in texts:
            ids = encode(text, self.labels)
            if not ids:
                continue
            # BOS padding with blank id 0 (see module docstring).
            padded = [0] * (self.order - 1) + ids
            for t in range(self.order - 1, len(padded)):
                c = padded[t]
                for m in range(self.order):
                    ctx = tuple(padded[t - m: t])
                    row = self.counts[m].get(ctx)
                    if row is None:
                        row = self.counts[m][ctx] = np.zeros(v, np.int64)
                    row[c] += 1
        self._table = None
        return self

    @classmethod
    def from_manifests(cls, manifest_paths, order: int = 3,
                       labels: str = LABELS) -> "CharNGramLM":
        from aas_enhancement_tpu.data.manifest import read_manifest, read_transcript
        texts = []
        for path in ([manifest_paths] if isinstance(manifest_paths, str)
                     else manifest_paths):
            for _, txt_path in read_manifest(path):
                texts.append(read_transcript(txt_path))
        return cls(order, labels).fit_texts(texts)

    # -------------------------------------------------------------- scoring
    def _logp_sparse(self, ctx: tuple, c: int) -> float:
        """log P(c | ctx) with stupid backoff over the sparse counts."""
        penalty = 0.0
        for m in range(len(ctx), -1, -1):
            row = self.counts[m].get(ctx[len(ctx) - m:])
            if row is not None and row[c] > 0:
                return penalty + math.log(row[c] / row.sum())
            penalty += _BACKOFF
        # Unseen even as a unigram: uniform floor under the full backoff stack.
        return (len(ctx) + 1) * _BACKOFF - math.log(len(self.labels))

    def dense_table(self) -> np.ndarray:
        """[V^(order-1), V] float32 of log P(c | ctx), backoff baked in."""
        if self._table is not None:
            return self._table
        v = len(self.labels)
        m = self.order - 1
        n_ctx = v ** m
        table = np.empty((n_ctx, v), np.float32)
        for idx in range(n_ctx):
            # Decode big-endian context digits.
            ctx, rem = [], idx
            for _ in range(m):
                ctx.append(rem % v)
                rem //= v
            ctx = tuple(reversed(ctx))
            for c in range(v):
                table[idx, c] = self._logp_sparse(ctx, c)
        self._table = table
        return table

    def logp(self, c: int, context) -> float:
        """log P(c | context ids); context shorter than order-1 is BOS-padded."""
        m = self.order - 1
        ctx = tuple(([0] * m + list(context))[-m:]) if m else ()
        return self._logp_sparse(ctx, c)

    # ------------------------------------------------------------------- io
    def save(self, path: str) -> None:
        data = {
            "order": self.order,
            "labels": self.labels,
            "counts": [
                {",".join(map(str, ctx)): row.tolist()
                 for ctx, row in level.items()}
                for level in self.counts
            ],
        }
        with open(path, "w") as f:
            json.dump(data, f)

    @classmethod
    def load(cls, path: str) -> "CharNGramLM":
        with open(path) as f:
            data = json.load(f)
        lm = cls(data["order"], data["labels"])
        for m, level in enumerate(data["counts"]):
            for key, row in level.items():
                ctx = tuple(int(x) for x in key.split(",")) if key else ()
                lm.counts[m][ctx] = np.asarray(row, np.int64)
        return lm


class WordNGramLM:
    """Word bigram LM with stupid backoff — the faithful KenLM stand-in.

    The reference's ctcdecode fuses a KenLM WORD LM (SURVEY.md §2 "NATIVE:
    ctcdecode"): the LM scores a word exactly when the beam completes it.
    Here the same contract: beam search (python and native C++) adds
        alpha * logp(word | prev_word) + beta
    once per COMPLETED word — on appending the space delimiter, and for the
    trailing word when ranking final beams.  Scoring backs off
    bigram -> 0.4*unigram -> 0.4^2*OOV-floor (same stupid-backoff scheme as
    CharNGramLM).

    Native export (`export_native`) flattens the model for C++: the word list
    as a label-id blob + offsets, and a dense [(W+1), W] bigram log-prob table
    whose last row is the BOS/unseen-context distribution; OOV words get a
    single flat `oov_logp` regardless of context.
    """

    is_word_lm = True

    def __init__(self, labels: str = LABELS):
        self.labels = labels
        self.uni: dict[str, int] = {}
        self.bi: dict[tuple[str, str], int] = {}
        self.bos: dict[str, int] = {}
        self.total = 0
        self.bos_total = 0
        self._ctx_totals = None
        self._native = None

    # ------------------------------------------------------------- training
    def fit_texts(self, texts) -> "WordNGramLM":
        for text in texts:
            words = text.split()
            if not words:
                continue
            self.bos[words[0]] = self.bos.get(words[0], 0) + 1
            self.bos_total += 1
            for i, w in enumerate(words):
                self.uni[w] = self.uni.get(w, 0) + 1
                self.total += 1
                if i:
                    key = (words[i - 1], w)
                    self.bi[key] = self.bi.get(key, 0) + 1
        self._ctx_totals = None
        self._native = None
        return self

    @classmethod
    def from_manifests(cls, manifest_paths, labels: str = LABELS) -> "WordNGramLM":
        from aas_enhancement_tpu.data.manifest import read_manifest, read_transcript
        texts = []
        for path in ([manifest_paths] if isinstance(manifest_paths, str)
                     else manifest_paths):
            for _, txt_path in read_manifest(path):
                texts.append(read_transcript(txt_path))
        return cls(labels).fit_texts(texts)

    # -------------------------------------------------------------- scoring
    @property
    def oov_logp(self) -> float:
        # Two backoff hops (bigram -> unigram -> floor) over an open vocab.
        return 2 * _BACKOFF - math.log(self.total + len(self.uni) + 1)

    def _uni_logp(self, w: str) -> float:
        c = self.uni.get(w, 0)
        if c == 0:
            return _BACKOFF - math.log(self.total + len(self.uni) + 1)
        return math.log(c / self.total)

    def logp(self, word: str, prev: str | None = None) -> float:
        """log P(word | prev); prev None = sentence start (BOS counts)."""
        if not word:
            return 0.0
        if prev is None:
            c = self.bos.get(word, 0)
            if c > 0:
                return math.log(c / self.bos_total)
            return _BACKOFF + self._uni_logp(word)
        c = self.bi.get((prev, word), 0)
        if c > 0:
            ctx_total = self._context_total(prev)
            return math.log(c / ctx_total)
        return _BACKOFF + self._uni_logp(word)

    def _context_total(self, prev: str) -> int:
        if getattr(self, "_ctx_totals", None) is None:
            totals: dict[str, int] = {}
            for (a, _), c in self.bi.items():
                totals[a] = totals.get(a, 0) + c
            self._ctx_totals = totals
        return self._ctx_totals.get(prev, 1)

    # ------------------------------------------------------- native export
    def export_native(self):
        """-> dict of flat arrays for the C++ decoder (cached).

        words get deterministic sorted ids; `table` is [(W+2), W]:
          row p < W   logp(words[w] | words[p])
          row W       logp(words[w] | BOS)           (sentence-initial word)
          row W+1     logp(words[w] | OOV prev)      (= backoff + unigram)
        OOV words themselves score the flat `oov_logp` in every context.
        The python fallback scores THROUGH this same table (word_table_score)
        so python and native fusion match bit for bit."""
        if self._native is not None:
            return self._native
        words = sorted(self.uni)
        wid = {w: i for i, w in enumerate(words)}
        n = len(words)
        char_to_id = {c: i for i, c in enumerate(self.labels)}
        ids, offsets = [], [0]
        for w in words:
            ids.extend(char_to_id[c] for c in w)
            offsets.append(len(ids))
        table = np.empty((n + 2, n), np.float32)
        for j, w in enumerate(words):
            table[n, j] = self.logp(w, prev=None)
            table[n + 1, j] = _BACKOFF + self._uni_logp(w)
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
            "wid": wid,
            "id_words": id_words,
        }
        return self._native

    # ------------------------------------------------------------------- io
    def save(self, path: str) -> None:
        data = {"kind": "word", "labels": self.labels,
                "uni": self.uni, "bos": self.bos,
                "bi": {f"{a}\t{b}": c for (a, b), c in self.bi.items()},
                "total": self.total, "bos_total": self.bos_total}
        with open(path, "w") as f:
            json.dump(data, f)

    @classmethod
    def load(cls, path: str) -> "WordNGramLM":
        with open(path) as f:
            data = json.load(f)
        lm = cls(data["labels"])
        lm.uni = dict(data["uni"])
        lm.bos = dict(data["bos"])
        lm.bi = {tuple(k.split("\t")): v for k, v in data["bi"].items()}
        lm.total = data["total"]
        lm.bos_total = data["bos_total"]
        return lm


def load_lm(path: str):
    """Load any supported LM file: the json formats above (the `kind` field
    disambiguates; char-LM files predate it) or a KenLM-style ARPA text file
    (sniffed by its \\data\\ header — decode/arpa.py)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        head = f.read(65536)
    if "\\data\\" in head.split("\\1-grams:")[0]:
        from aas_enhancement_tpu.decode.arpa import ArpaWordLM
        return ArpaWordLM.load_arpa(path)
    data = json.loads(head if len(head) < 65536 else open(path).read())
    if data.get("kind") == "word":
        return WordNGramLM.load(path)
    return CharNGramLM.load(path)


def context_index(prefix_ids, order: int, vocab_size: int) -> int:
    """The dense-table row for a decoded prefix (shared contract with C++)."""
    m = order - 1
    if m == 0:
        return 0
    padded = ([0] * m + list(prefix_ids))[-m:]
    idx = 0
    for s in padded:
        idx = idx * vocab_size + int(s)
    return idx
