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
