"""`prepare_data` entry point: synthetic corpus generation + manifest tooling.

Reference parity: the data prep scripts (SURVEY.md §2 "Data prep scripts") that
download/link corpora and write manifests.  Real CHiME-4/Librispeech are licensed and
absent here, so the primary mode generates the deterministic synthetic corpus; a
--from-dir mode builds a manifest from any directory of wav+txt pairs so real corpora
plug in when available.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

from aas_enhancement_tpu.data.manifest import write_manifest
from aas_enhancement_tpu.data.synthetic import generate_corpus


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-utts", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--snr-low", type=float, default=0.0)
    p.add_argument("--snr-high", type=float, default=10.0)
    p.add_argument("--vocab-chars", type=int, default=0,
                   help="restrict transcripts to first N chars (easier CTC)")
    p.add_argument("--from-dir", help="instead: build manifest from an existing dir "
                                      "of .wav files with sibling .txt transcripts")
    args = p.parse_args(argv)

    if args.from_dir:
        entries = []
        for wav in sorted(glob.glob(os.path.join(args.from_dir, "**", "*.wav"),
                                    recursive=True)):
            txt = os.path.splitext(wav)[0] + ".txt"
            if os.path.exists(txt):
                entries.append((wav, txt))
        manifest = os.path.join(args.out_dir, "manifest.csv")
        write_manifest(manifest, entries)
        print(json.dumps({"manifest": manifest, "utterances": len(entries)}))
        return

    out = generate_corpus(args.out_dir, n_utts=args.n_utts, seed=args.seed,
                          snr_range=(args.snr_low, args.snr_high),
                          vocab_chars=args.vocab_chars)
    print(json.dumps({**out, "utterances": args.n_utts}))


if __name__ == "__main__":
    main()
