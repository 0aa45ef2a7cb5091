"""Tighten the trigram-vs-bigram comparison (VERDICT r3 #1) on a LARGER
held-out split: 48 test utterances leave the tri-win inside the bootstrap CI,
so re-decode bi and tri at the dev-tuned weights on a fresh N-utterance
corpus (disjoint seed) with the AM and ARPA files the main run trained
(`scripts/trigram_fusion_eval.py` workdir).  Patches wer_test_{bi,tri}_big +
paired per-utterance stats into trigram_fusion_r4.json.

The paired test is the right lens: both LMs decode the SAME utterances, so
the per-utterance WER delta's sign distribution beats comparing overlapping
corpus-level CIs.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aas_trigram")
    p.add_argument("--n-utts", type=int, default=192)
    p.add_argument("--seed", type=int, default=104659,
                   help="fresh corpus seed (train 7 / dev 104729 / test 7919)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--beam-width", type=int, default=32)
    p.add_argument("--result", default="trigram_fusion_r4.json")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.decode.arpa import ArpaWordLM
    from aas_enhancement_tpu.evaluation import evaluate_wer
    from aas_enhancement_tpu.train.loop import load_state

    result = json.load(open(args.result))
    tri_classes = result["tri_classes"]
    snr = tuple(result["snr_range"])
    big_m = generate_corpus(os.path.join(args.workdir, "corpus_big"),
                            n_utts=args.n_utts, seed=args.seed,
                            snr_range=snr, n_words=(3, 8),
                            tri_classes=tri_classes, reverb_prob=0.3)

    am_state, am_cfg = load_state(os.path.join(args.workdir, "ckpt_am"))
    legs = {}
    for tag in ("bi", "tri"):
        lm = ArpaWordLM.load_arpa(
            os.path.join(args.workdir, f"word{2 if tag == 'bi' else 3}.arpa"))
        legs[tag] = evaluate_wer(
            am_cfg, am_state.am_params, big_m["noisy"],
            batch_size=args.batch_size, decoder="beam",
            beam_width=args.beam_width, lm=lm,
            lm_alpha=result[f"lm_{tag}_alpha"],
            lm_beta=result[f"lm_{tag}_beta"], per_utt=True)
        result[f"wer_test_{tag}_big"] = legs[tag]["wer"]
        result[f"wer_test_{tag}_big_ci95"] = legs[tag].get("wer_ci95")

    # Paired per-utterance deltas (tri - bi errors on identical utterances).
    eb, et = legs["bi"].get("per_utt"), legs["tri"].get("per_utt")
    if eb and et:
        deltas = [t - b for b, t in zip(eb, et)]
        result["big_paired"] = {
            "n": len(deltas),
            "tri_better": sum(1 for d in deltas if d < 0),
            "bi_better": sum(1 for d in deltas if d > 0),
            "ties": sum(1 for d in deltas if d == 0),
        }
    result["n_big_test_utts"] = args.n_utts
    result["trigram_win_abs_big"] = round(
        result["wer_test_bi_big"] - result["wer_test_tri_big"], 6)
    with open(args.result, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: result[k] for k in
                      ("wer_test_bi_big", "wer_test_tri_big",
                       "trigram_win_abs_big", "big_paired")
                      if k in result}))


if __name__ == "__main__":
    main()
