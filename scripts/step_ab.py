"""Full-AAS-step A/B for one env-gated change, in one process per arm.

Usage: python scripts/step_ab.py [--steps 30] [--reps 3]
Runs bench.bench_train_step() and prints one JSON line; flip the arm with the
gate env var set by the CALLER (e.g. AAS_PHASEDX=0 vs 1).  The gate is read at
trace time, so each arm must be its own process — jit would otherwise reuse
the first compilation.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from aas_enhancement_tpu.utils import jax_cache
jax_cache.enable()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import bench
    rows = []
    for _ in range(args.reps):
        r = bench.bench_train_step(steps=args.steps)
        rows.append(r)
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                          for k, v in r.items()},
                         ), flush=True)
    best = max(rows, key=lambda r: r["train_utts_per_sec_per_chip"])
    print(json.dumps({"best_utts_per_sec_per_chip":
                      round(best["train_utts_per_sec_per_chip"], 2),
                      "best_step_ms": round(best["train_step_ms"], 2),
                      "gate_AAS_PHASEDX": _os.environ.get("AAS_PHASEDX", "1"),
                      "gate_AAS_TAPDW": _os.environ.get("AAS_TAPDW", "1"),
                      "gate_AAS_FREQFOLD": _os.environ.get("AAS_FREQFOLD",
                                                           "1")}),
          flush=True)


if __name__ == "__main__":
    main()
