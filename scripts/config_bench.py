"""Per-config benchmark: the five reference training/inference configs.

BASELINE.json:7-11 lists the reference's five run configurations (single-
utterance CPU enhancement; paired L1/MSE; adversarial-only GAN; acoustic with
frozen CTC AM; full AAS joint).  bench.py measures the flagship (config 5 on
one chip); this measures the other objectives as their own warm jitted steps
at the production batch, plus config 1's batch-1 CPU RTF, and writes one JSON
row per config to fill BASELINE.md's per-config table.

Usage:
  python scripts/config_bench.py                 # TPU objectives + CPU child
  python scripts/config_bench.py --cpu-enhance   # (internal) config-1 child
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import sys
import time


def cpu_enhance_rtf(seconds: float = 8.0, iters: int = 5) -> None:
    """Config 1: single-utterance (batch-1) STFT->G->ISTFT on the host CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.enhance import init_enhancer, make_enhance_fn

    cfg = Config()
    params = init_enhancer(cfg, jax.random.key(0))
    fn = make_enhance_fn(cfg)
    n = int(cfg.audio.sample_rate * seconds)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, n)),
                      jnp.float32) * 0.1
    lengths = jnp.full((1,), n, jnp.int32)

    out = fn(params, wav, lengths)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, wav, lengths)
    float(out[0, 0])
    rtf = (time.perf_counter() - t0) / (seconds * iters)
    print(json.dumps({"config": 1, "name": "cpu_single_utt_enhance",
                      "rtf": round(rtf, 4), "xrt": round(1.0 / rtf, 1),
                      "device": str(jax.devices()[0])}))


def bench_objective(objective: str, batch_size: int = 128,
                    seconds: float = 8.0, steps: int = 10) -> dict:
    """One warm jitted train step for the given objective, production shapes
    (bf16 compute, 8 s utterances) — the same protocol as bench.bench_train_step."""
    import jax

    from aas_enhancement_tpu.config import (AMConfig, Config,
                                            DiscriminatorConfig,
                                            EnhancerConfig, MeshConfig,
                                            TrainConfig)
    from aas_enhancement_tpu.parallel.mesh import make_mesh, replicate_state
    from aas_enhancement_tpu.train.loop import init_state
    from aas_enhancement_tpu.train.steps import make_train_step

    cfg = Config(am=AMConfig(dtype="bfloat16"),
                 enhancer=EnhancerConfig(dtype="bfloat16"),
                 discriminator=DiscriminatorConfig(dtype="bfloat16"),
                 train=TrainConfig(objective=objective, batch_size=batch_size),
                 mesh=MeshConfig())
    mesh = make_mesh(cfg.mesh)
    n_chips = len(mesh.devices.ravel())

    n = int(cfg.audio.sample_rate * seconds)

    # Batch built ON DEVICE: the resident-batch protocol doesn't care where
    # the random bits came from, and a host batch would pay 2 x 65 MB through
    # this environment's ~10-50 MB/s tunnel per objective.
    import jax.numpy as jnp

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "wav": 0.1 * jax.random.normal(k1, (batch_size, n), jnp.float32),
            "wav_lengths": jnp.full((batch_size,), n, jnp.int32),
            "labels": jax.random.randint(k3, (batch_size, 48), 1, 29, jnp.int32),
            "label_paddings": jnp.zeros((batch_size, 48), jnp.float32),
            "clean_wav": 0.1 * jax.random.normal(k2, (batch_size, n), jnp.float32),
            "clean_wav_lengths": jnp.full((batch_size,), n, jnp.int32),
        }

    state = init_state(cfg, jax.random.key(0))
    state = replicate_state(mesh, state)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))

    def sync(aux):
        # Scalar fetch of any aux leaf = tunnel-safe completion barrier
        # (objectives report different loss keys: loss_paired / loss_g /
        # loss_ctc_am).
        float(jax.tree.leaves(aux)[0].ravel()[0])

    with mesh:
        sharded = jax.device_put(make_batch(jax.random.key(7)),
                                 jax.devices()[0])
        state, aux = step(state, sharded)
        sync(aux)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(steps):
            state, aux = step(state, sharded)
        sync(aux)
        dt = time.perf_counter() - t0

    return {"objective": objective,
            "utts_per_sec_per_chip": round(batch_size * steps / dt / n_chips, 1),
            "step_ms": round(1000.0 * dt / steps, 1), "n_chips": n_chips}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-enhance", action="store_true")
    p.add_argument("--out", default="")
    args = p.parse_args()

    if args.cpu_enhance:
        # sitecustomize pins the axon backend at interpreter startup; env alone
        # is not enough (same workaround as __graft_entry__._DRYRUN_AS_MAIN).
        _os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        cpu_enhance_rtf()
        return

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    rows = []
    # Configs 2-5 are BASELINE.json:7-11's numbered run modes; "am" (CTC
    # pre-training of the acoustic model) is the unnumbered prerequisite stage
    # of the reference workflow and is benchmarked alongside them.
    for i, objective in ((2, "paired"), (3, "adversarial"), (4, "acoustic"),
                         (5, "aas"), ("am", "am")):
        r = {"config": i, **bench_objective(objective)}
        print(json.dumps(r), flush=True)
        rows.append(r)

    # Config 1 runs batch-1 on the host CPU in a child (sitecustomize pins the
    # axon backend at startup, so the platform switch needs a fresh process).
    env = dict(_os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, _os.path.abspath(__file__), "--cpu-enhance"],
        env=env, capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            rows.append(json.loads(line))
            print(line, flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-500:], file=sys.stderr)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
