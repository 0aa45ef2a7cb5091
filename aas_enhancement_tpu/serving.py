"""Serving export: the fused enhancement program as a self-contained artifact.

Production-deployment capability on top of the reference's enhance entry point
(SURVEY.md §3.3): `export_enhancer` serializes the WHOLE inference program —
STFT -> conv/BLSTM enhancer -> ISTFT, with the trained weights baked in as
constants — via `jax.export` (StableHLO).  The artifact is a directory of
serialized programs (one per padded input shape bucket) plus a manifest; a
server loads it with `load_enhancer` and runs inference with NO model code,
python weights, or re-tracing — just shape-bucket dispatch and a compiled call.

Why shape buckets instead of symbolic dims: the hot path uses Pallas TPU
kernels whose grids are shape-specialized (ops/pallas/stft_kernel.py), and XLA
compiles one executable per static shape anyway — the bucket set IS the
deployment contract (same scheme as training's duration buckets,
data/dataset.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

from aas_enhancement_tpu.config import Config

_MANIFEST = "manifest.json"


def export_enhancer(cfg: Config, params, out_dir: str,
                    batch_sizes: tuple[int, ...] = (1, 8),
                    seconds: tuple[float, ...] = (8.0,)) -> dict:
    """Serialize the fused enhance program for each (batch, samples) bucket.

    Weights are closed over, so they are embedded in the serialized program —
    the artifact needs no checkpoint at serving time.  Returns the manifest.
    """
    import jax
    from jax import export as jexport

    from aas_enhancement_tpu.enhance import make_enhance_fn

    os.makedirs(out_dir, exist_ok=True)
    fn = make_enhance_fn(cfg)
    baked = jax.jit(lambda wav, lengths: fn(params, wav, lengths))

    sr = cfg.audio.sample_rate
    entries = []
    for b in batch_sizes:
        for sec in seconds:
            n = int(sr * sec)
            exp = jexport.export(baked)(
                jax.ShapeDtypeStruct((b, n), np.float32),
                jax.ShapeDtypeStruct((b,), np.int32))
            fname = f"enhance_b{b}_n{n}.bin"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            entries.append({"batch": b, "samples": n, "file": fname,
                            "platforms": list(exp.platforms)})

    manifest = {
        "kind": "aas_enhancement_tpu.enhancer",
        "sample_rate": sr,
        "entries": sorted(entries, key=lambda e: (e["batch"], e["samples"])),
        "config": json.loads(cfg.to_json()),
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServedEnhancer:
    """Loaded serving artifact: shape-bucket dispatch over exported programs.

    enhance(wav [B, n], lengths) pads B and n up to the smallest covering
    bucket, runs the deserialized program, and strips the padding — mirroring
    the training pipeline's bucket semantics.
    """

    def __init__(self, out_dir: str):
        from jax import export as jexport

        with open(os.path.join(out_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.sample_rate = self.manifest["sample_rate"]
        self._programs = {}
        for e in self.manifest["entries"]:
            with open(os.path.join(out_dir, e["file"]), "rb") as f:
                self._programs[(e["batch"], e["samples"])] = jexport.deserialize(
                    f.read())
        if not self._programs:
            raise ValueError(f"{out_dir}: empty serving manifest")

    def buckets(self) -> list[tuple[int, int]]:
        return sorted(self._programs)

    def _pick(self, b: int, n: int) -> tuple[int, int]:
        fits = [(pb, pn) for (pb, pn) in self._programs if pb >= b and pn >= n]
        if not fits:
            raise ValueError(
                f"no exported bucket covers batch={b}, samples={n}; "
                f"available: {self.buckets()}")
        return min(fits, key=lambda s: (s[0] * s[1], s))

    def enhance(self, wav: np.ndarray, lengths: np.ndarray | None = None
                ) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        b, n = wav.shape
        if lengths is None:
            lengths = np.full((b,), n, np.int32)
        pb, pn = self._pick(b, n)
        pad_wav = np.zeros((pb, pn), np.float32)
        pad_wav[:b, :n] = wav
        pad_len = np.zeros((pb,), np.int32)
        pad_len[:b] = np.asarray(lengths, np.int32)
        out = self._programs[(pb, pn)].call(pad_wav, pad_len)
        return np.asarray(out)[:b, :n]


def load_enhancer(out_dir: str) -> ServedEnhancer:
    return ServedEnhancer(out_dir)
