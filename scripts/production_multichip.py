"""Production-shape multichip evidence (VERDICT r2 #5).

Two checks, one artifact:

1. **8-device production dryrun** — `__graft_entry__.dryrun_multichip(8,
   production=True)`: the DEFAULT model sizes (AM GRU-512x4, G conv32x2 +
   BLSTM-256x2, D 32/64/128, bf16) at global batch 128 x 8 s sharded over an
   8-device virtual CPU mesh; compiles AND executes one real step.
2. **Per-chip AOT memory analysis on the real TPU** — for pure data
   parallelism the per-chip memory of an 8-chip B=128 run equals a 1-chip
   B=16 run (params/optimizer replicated, activations 1/8th, plus negligible
   all-reduce buffers), so the one attached chip CAN certify the production
   shard: AOT-compile the full AAS step at B=16 and report XLA's memory
   analysis against the v5e 16 GB HBM budget.

Writes PRODSHAPE_r03.json:
  {"dryrun_8dev_production": "...", "per_chip": {...bytes...}, "ok": true}
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import io
import json
import time
from contextlib import redirect_stdout


def per_chip_memcheck(per_chip_batch: int = 16, seconds: float = 8.0) -> dict:
    """AOT-compile the production AAS step at the per-chip shard size on the
    attached device and return XLA's memory analysis."""
    import jax
    import numpy as np

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from __graft_entry__ import memory_analysis_dict
    from aas_enhancement_tpu.config import (AMConfig, Config,
                                            DiscriminatorConfig,
                                            EnhancerConfig, TrainConfig)
    from aas_enhancement_tpu.train.loop import init_state
    from aas_enhancement_tpu.train.steps import make_train_step

    cfg = Config(am=AMConfig(dtype="bfloat16"),
                 enhancer=EnhancerConfig(dtype="bfloat16"),
                 discriminator=DiscriminatorConfig(dtype="bfloat16"),
                 train=TrainConfig(objective="aas",
                                   batch_size=per_chip_batch))
    state = init_state(cfg, jax.random.key(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))

    b, n = per_chip_batch, int(seconds * cfg.audio.sample_rate)
    rng = np.random.default_rng(0)
    batch = {
        "wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "wav_lengths": np.full((b,), n, np.int32),
        "labels": rng.integers(1, 29, size=(b, 48)).astype(np.int32),
        "label_paddings": np.zeros((b, 48), np.float32),
        "clean_wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "clean_wav_lengths": np.full((b,), n, np.int32),
    }
    t0 = time.perf_counter()
    compiled = step.lower(state, batch).compile()
    compile_s = time.perf_counter() - t0
    mem = memory_analysis_dict(compiled)
    hbm = 16 * 1024 ** 3  # v5e HBM per chip
    total = (mem.get("argument_size_in_bytes", 0)
             + mem.get("temp_size_in_bytes", 0)
             + mem.get("output_size_in_bytes", 0)
             - mem.get("alias_size_in_bytes", 0))
    return {"device": str(jax.devices()[0]), "per_chip_batch": per_chip_batch,
            "seconds": seconds, "compile_s": round(compile_s, 1), **mem,
            "total_live_bytes": int(total), "hbm_bytes": hbm,
            "fits_hbm": bool(0 < total < hbm) if mem else None}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-devices", type=int, default=8)
    p.add_argument("--skip-cpu-dryrun", action="store_true")
    p.add_argument("--skip-tpu-memcheck", action="store_true")
    p.add_argument("--out", default="PRODSHAPE_r03.json")
    args = p.parse_args()

    result: dict = {"ok": True}

    if not args.skip_cpu_dryrun:
        import __graft_entry__ as g
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with redirect_stdout(buf):
                g.dryrun_multichip(args.n_devices, production=True)
            result["dryrun_8dev_production"] = buf.getvalue().strip()
            result["dryrun_wall_s"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # record the failure, don't hide it
            result["ok"] = False
            result["dryrun_error"] = f"{type(e).__name__}: {e}"[-2000:]

    if not args.skip_tpu_memcheck:
        try:
            result["per_chip"] = per_chip_memcheck()
            if result["per_chip"].get("fits_hbm") is False:
                result["ok"] = False
        except Exception as e:
            result["ok"] = False
            result["memcheck_error"] = f"{type(e).__name__}: {e}"[-2000:]

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
