"""Benchmark harness: the north-star metrics on real hardware (BASELINE.json:2).

Prints ONE JSON line:
  {"metric": "aas_train_utts_per_sec_per_chip", "value": N, "unit": "utts/s/chip",
   "vs_baseline": R, ...extras}

The reference never published throughput numbers and its repo is unreadable
(SURVEY.md §6), so the baseline is SELF-ESTABLISHED: the first recorded value lives
in BASELINE.md ("self_baseline"), and vs_baseline = value / self_baseline.  Until a
recorded value exists, vs_baseline defaults to 1.0.

Measured:
- full AAS joint train step (enhancer+discriminator+frozen AM, both optimizer
  updates, default model sizes) at batch 8 x 8 s utterances -> utts/sec/chip
- fused enhancement inference path -> RTF and xRT (times faster than real-time)
"""

from __future__ import annotations

import json
import os
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.utils import jax_cache

jax_cache.enable()

from aas_enhancement_tpu.config import Config, MeshConfig, TrainConfig
from aas_enhancement_tpu.enhance import init_enhancer, make_enhance_fn
from aas_enhancement_tpu.parallel.mesh import (make_mesh, replicate_state,
                                               shard_batch)
from aas_enhancement_tpu.train.loop import init_state
from aas_enhancement_tpu.train.steps import make_train_step

SELF_BASELINE_RE = re.compile(r"self_baseline:\s*([0-9.]+)")


def _read_self_baseline() -> float | None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        m = SELF_BASELINE_RE.search(open(path).read())
        return float(m.group(1)) if m else None
    except OSError:
        return None


def bench_train_step(batch_size: int = 64, seconds: float = 8.0,
                     steps: int = 10) -> dict:
    """Full AAS joint step in the production configuration: bf16 compute (f32
    params/loss) at batch 64.  The step is scan-latency bound, so throughput rises
    with batch (82 -> 145 utts/s/chip f32 from B=8 to 64; 204 with bf16)."""
    from aas_enhancement_tpu.config import (AMConfig, DiscriminatorConfig,
                                            EnhancerConfig)
    cfg = Config(am=AMConfig(dtype="bfloat16"),
                 enhancer=EnhancerConfig(dtype="bfloat16"),
                 discriminator=DiscriminatorConfig(dtype="bfloat16"),
                 train=TrainConfig(objective="aas", batch_size=batch_size),
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
        # Warmup / compile.  Sync via scalar fetch: through the remote-execution
        # tunnel, block_until_ready alone does not guarantee completion.
        state, aux = step(state, sharded)
        float(aux["loss_g"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = step(state, sharded)
        float(aux["loss_g"])
        dt = time.perf_counter() - t0

    utts_per_sec = batch_size * steps / dt
    return {"train_utts_per_sec_per_chip": utts_per_sec / n_chips,
            "train_step_ms": 1000.0 * dt / steps, "n_chips": n_chips}


def bench_enhance(batch_size: int = 8, seconds: float = 8.0, iters: int = 10) -> dict:
    cfg = Config()
    params = init_enhancer(cfg, jax.random.key(0))
    fn = make_enhance_fn(cfg)
    sr = cfg.audio.sample_rate
    n = int(sr * seconds)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((batch_size, n)),
                      jnp.float32) * 0.1
    lengths = jnp.full((batch_size,), n, dtype=jnp.int32)

    out = fn(params, wav, lengths)
    float(out[0, 0])  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, wav, lengths)
    float(out[0, 0])
    dt = time.perf_counter() - t0

    audio_seconds = batch_size * seconds * iters
    rtf = dt / audio_seconds
    return {"enhance_rtf": rtf, "enhance_xrt": 1.0 / rtf}


def main() -> None:
    train_m = bench_train_step()
    enh_m = bench_enhance()
    value = train_m["train_utts_per_sec_per_chip"]
    self_baseline = _read_self_baseline()
    vs = value / self_baseline if self_baseline else 1.0
    print(json.dumps({
        "metric": "aas_train_utts_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "utts/s/chip",
        "vs_baseline": round(vs, 3),
        "train_step_ms": round(train_m["train_step_ms"], 2),
        "enhance_rtf": round(enh_m["enhance_rtf"], 6),
        "enhance_xrt": round(enh_m["enhance_xrt"], 2),
        "n_chips": train_m["n_chips"],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
