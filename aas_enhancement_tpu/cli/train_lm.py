"""`train_lm` entry point: build a char n-gram LM from training manifests.

The KenLM stand-in for beam-search fusion (SURVEY.md §2 "NATIVE: ctcdecode" —
the reference decodes with beam + KenLM; KenLM is absent from this image, so
the scorer is a char n-gram trained on the corpus transcripts, consumed by
`evaluate --decoder beam --lm <out>`).

Usage:
  python -m aas_enhancement_tpu.cli.train_lm \
      --manifest train_manifest.csv --order 3 --out lm.json
"""

from __future__ import annotations

import argparse
import json

from aas_enhancement_tpu.decode.lm import CharNGramLM


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", action="append", required=True,
                   help="training manifest csv (repeatable)")
    p.add_argument("--order", type=int, default=3,
                   help="n-gram order (dense table is V^(order-1) x V; "
                        "keep <= 4 for the 29-char vocab)")
    p.add_argument("--out", required=True, help="output LM json path")
    args = p.parse_args(argv)

    lm = CharNGramLM.from_manifests(args.manifest, order=args.order)
    lm.save(args.out)
    n_ctx = sum(len(level) for level in lm.counts)
    print(json.dumps({"out": args.out, "order": lm.order,
                      "contexts": n_ctx, "vocab": len(lm.labels)}))


if __name__ == "__main__":
    main()
