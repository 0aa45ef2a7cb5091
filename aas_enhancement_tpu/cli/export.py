"""`export` entry point: trained enhancer checkpoint -> serving artifact.

Serializes the fused STFT->enhancer->ISTFT program (weights baked in) per
input-shape bucket via jax.export — see serving.py.  A serving process loads
the artifact with `aas_enhancement_tpu.serving.load_enhancer` and needs no
model code or checkpoint.

Usage:
  python -m aas_enhancement_tpu.cli.export --checkpoint ck_aas --out serving/ \
      [--batch-sizes 1,8] [--seconds 8,16]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="train-CLI checkpoint dir with enhancer params")
    p.add_argument("--out", required=True, help="serving artifact directory")
    p.add_argument("--batch-sizes", default="1,8")
    p.add_argument("--seconds", default="8")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from aas_enhancement_tpu.serving import export_enhancer
    from aas_enhancement_tpu.train.loop import load_state

    state, cfg = load_state(args.checkpoint)
    if not state.g_params:
        raise SystemExit(f"{args.checkpoint}: checkpoint has no enhancer "
                         f"(objective was {cfg.train.objective!r})")

    manifest = export_enhancer(
        cfg, state.g_params, args.out,
        batch_sizes=tuple(int(x) for x in args.batch_sizes.split(",")),
        seconds=tuple(float(x) for x in args.seconds.split(",")))
    print(json.dumps({"out": args.out,
                      "entries": len(manifest["entries"]),
                      "buckets": [(e["batch"], e["samples"])
                                  for e in manifest["entries"]]}))


if __name__ == "__main__":
    main()
