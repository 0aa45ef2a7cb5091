"""Measure every BASELINE.json driver config (1-5) — the 'to be measured'
table in BASELINE.md.

Configs (BASELINE.json:7-11, mirroring the reference's five run modes):
  1. single-utterance enhance (STFT -> G -> ISTFT) — RTF, CPU and TPU
  2. paired L1 supervised            — train utts/s/chip
  3. adversarial-only GAN            — train utts/s/chip
  4. acoustic (frozen CTC AM)        — train utts/s/chip
  5. full AAS joint                  — train utts/s/chip (the bench.py headline)

Training rows run the production model sizes (GRU-512x4 AM, BLSTM-256x2 G)
at bf16 B=128 x 8 s, one jitted step each, resident batch (the host pipeline
is measured separately by bench.py's `sustained`).  Prints one JSON line per
row; `python scripts/bench_configs.py --out FILE` also writes them as a list.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.utils import jax_cache
jax_cache.enable()


def _sync(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def bench_objective(objective: str, batch_size: int = 128,
                    seconds: float = 8.0, steps: int = 10) -> dict:
    from aas_enhancement_tpu.config import (AMConfig, Config,
                                            DiscriminatorConfig,
                                            EnhancerConfig, MeshConfig,
                                            TrainConfig)
    from aas_enhancement_tpu.parallel.mesh import (make_mesh, replicate_state,
                                                   shard_batch)
    from aas_enhancement_tpu.train.loop import init_state
    from aas_enhancement_tpu.train.steps import make_train_step

    cfg = Config(am=AMConfig(dtype="bfloat16"),
                 enhancer=EnhancerConfig(dtype="bfloat16"),
                 discriminator=DiscriminatorConfig(dtype="bfloat16"),
                 train=TrainConfig(objective=objective, batch_size=batch_size),
                 mesh=MeshConfig())
    mesh = make_mesh(cfg.mesh)
    n_chips = len(mesh.devices.ravel())
    sr = cfg.audio.sample_rate
    n = int(sr * seconds)
    rng = np.random.default_rng(0)
    batch = {
        "wav": rng.standard_normal((batch_size, n)).astype(np.float32) * 0.1,
        "wav_lengths": np.full((batch_size,), n, np.int32),
        "labels": rng.integers(1, 29, size=(batch_size, 48)).astype(np.int32),
        "label_paddings": np.zeros((batch_size, 48), np.float32),
        "clean_wav": rng.standard_normal((batch_size, n)).astype(np.float32) * 0.1,
        "clean_wav_lengths": np.full((batch_size,), n, np.int32),
    }
    state = init_state(cfg, jax.random.key(0))
    state = replicate_state(mesh, state)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    with mesh:
        sharded = shard_batch(mesh, batch)
        t_c0 = time.perf_counter()
        state, aux = step(state, sharded)
        _sync(aux)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = step(state, sharded)
        _sync(aux)
        dt = time.perf_counter() - t0
    return {"config": objective,
            "train_utts_per_sec_per_chip": round(batch_size * steps / dt
                                                 / n_chips, 2),
            "step_ms": round(1000.0 * dt / steps, 2),
            "compile_s": round(compile_s, 1),
            "batch": batch_size, "n_chips": n_chips,
            "platform": jax.devices()[0].platform}


def bench_enhance_single(seconds: float = 8.0, iters: int = 10) -> dict:
    """Config 1: batch-1 STFT -> G -> ISTFT (the reference's single-utterance
    enhance entry point), on whatever platform this process sees."""
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.enhance import init_enhancer, make_enhance_fn

    cfg = Config()
    params = init_enhancer(cfg, jax.random.key(0))
    fn = make_enhance_fn(cfg)
    n = int(cfg.audio.sample_rate * seconds)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, n)),
                      jnp.float32) * 0.1
    lengths = jnp.full((1,), n, dtype=jnp.int32)
    out = fn(params, wav, lengths)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, wav, lengths)
    _sync(out)
    rtf = (time.perf_counter() - t0) / (seconds * iters)
    return {"config": "enhance_single_utt", "rtf": rtf,
            "x_real_time": round(1.0 / rtf, 1),
            "platform": jax.devices()[0].platform}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--skip-enhance", action="store_true")
    args = p.parse_args()

    rows = []
    if not args.skip_enhance:
        rows.append(bench_enhance_single())
        print(json.dumps(rows[-1]), flush=True)
    for objective in ("paired", "adversarial", "acoustic", "am", "aas"):
        rows.append(bench_objective(objective, steps=args.steps))
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
