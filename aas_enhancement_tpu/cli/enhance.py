"""`enhance` entry point: batch-enhance a manifest (or single wav) and write wavs.

Reference parity: the public enhance script (SURVEY.md §2 "Enhance entry point",
§3.3) — read manifest -> STFT -> enhancer forward -> ISTFT with noisy phase -> write
enhanced wavs.  TPU-first: utterances are padded to a small set of bucket lengths so
the fused STFT->G->ISTFT program compiles once per bucket; RTF is reported.

Usage:
  python -m aas_enhancement_tpu.cli.enhance --input noisy.wav --out-dir out/
  python -m aas_enhancement_tpu.cli.enhance --manifest noisy_manifest.csv --out-dir out/ \
      --checkpoint ckpts/   (omit --checkpoint to run a random-init network)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.data.manifest import read_manifest
from aas_enhancement_tpu.data.wav import read_wav, write_wav
from aas_enhancement_tpu.enhance import init_enhancer, make_enhance_fn


def _bucket_length(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # Longer than the largest bucket: round up to its granularity (a new compile
    # per extra-long shape beats silently truncating the audio).
    step = buckets[-1]
    return ((n + step - 1) // step) * step


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="single noisy wav")
    p.add_argument("--manifest", help="noisy manifest CSV (wav_path,txt_path)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--checkpoint", help="checkpoint dir (omit for random init)")
    p.add_argument("--config", help="config JSON (defaults used if omitted)")
    p.add_argument("--mode", choices=["mask", "mapping"], default=None)
    p.add_argument("--streaming", action="store_true",
                   help="chunked streaming path (block-bidirectional, "
                        "chunk+lookahead latency) instead of whole-utterance")
    p.add_argument("--chunk-seconds", type=float, default=1.0)
    p.add_argument("--lookahead-seconds", type=float, default=0.2)
    p.add_argument("--history-seconds", type=float, default=1.0,
                   help="left context per block (warm fwd-BLSTM state; "
                        "adds compute, not latency)")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    cfg = Config.from_json(open(args.config).read()) if args.config else Config()
    if args.mode:
        import dataclasses
        cfg = cfg.replace(enhancer=dataclasses.replace(cfg.enhancer, mode=args.mode))

    if args.checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        state, ck_cfg = load_state(args.checkpoint)
        if not state.g_params:
            raise SystemExit(f"{args.checkpoint}: checkpoint has no enhancer")
        params = state.g_params
        if not args.config:
            cfg = cfg.replace(enhancer=ck_cfg.enhancer, audio=ck_cfg.audio)
    else:
        params = init_enhancer(cfg, jax.random.key(cfg.train.seed))

    paths = []
    if args.input:
        paths.append(args.input)
    if args.manifest:
        paths.extend(w for w, _ in read_manifest(args.manifest))
    if not paths:
        p.error("need --input or --manifest")

    os.makedirs(args.out_dir, exist_ok=True)
    fn = make_enhance_fn(cfg)

    sr = cfg.audio.sample_rate
    buckets = [sr * s for s in (2, 4, 8, 16)]
    total_audio, total_wall = 0.0, 0.0
    for path in paths:
        wav, file_sr = read_wav(path)
        if file_sr != sr:
            raise ValueError(f"{path}: sample rate {file_sr} != config {sr}")
        n = len(wav)

        t0 = time.perf_counter()
        if args.streaming:
            from aas_enhancement_tpu.streaming import enhance_stream
            enhanced = np.concatenate(list(enhance_stream(
                cfg, params, wav, args.chunk_seconds, args.lookahead_seconds,
                args.history_seconds)))
        else:
            padded_n = _bucket_length(n, buckets)
            x = np.zeros(padded_n, np.float32)
            x[:n] = wav
            out = fn(params, jnp.asarray(x)[None], jnp.array([n], jnp.int32))
            enhanced = np.asarray(out[0])[:n]
        wall = time.perf_counter() - t0

        write_wav(os.path.join(args.out_dir, os.path.basename(path)), enhanced, sr)
        total_audio += n / sr
        total_wall += wall

    rtf = total_wall / max(total_audio, 1e-9)
    print(json.dumps({"utterances": len(paths), "audio_seconds": round(total_audio, 3),
                      "wall_seconds": round(total_wall, 3), "rtf": round(rtf, 5)}))


if __name__ == "__main__":
    main()
