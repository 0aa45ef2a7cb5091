"""Harsh-SNR 1000-word fusion THROUGH the enhancement pipeline.

`biglex_hard_fusion_r4.json` records the honest negative: the fusion-eval
protocol trains its AM directly on noisy audio, which does not converge at
-7..-2 dB (greedy WER 100%, trigram win 0.0).  The flagship harsh e2e shows
why: below ~0 dB the enhancer IS the capability (noisy 155% -> enhanced
42.9% greedy -> 5.5% hybrid).  So the meaningful harsh fusion number runs
the 1000-word corpus through the FLAGSHIP harsh checkpoint (enhancer + AM
from `scripts/e2e_demo.py --full --hard`, `trained_params.pkl`) and fuses
the biglex bi/tri ARPA LMs on top.

This is simultaneously a cross-lexicon generalization test: the flagship
acoustic stack trained on the standard ~100-word lexicon; the biglex corpus
is a disjoint 1000-word vocabulary (same character inventory / synthesis),
so the AM must generalize at the character level while the word LMs supply
the new lexicon's structure.  Patches wer_pipeline_* fields into the result
JSON next to the recorded negative.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flagship", default="/tmp/aas_e2e_full_hard/trained_params.pkl")
    p.add_argument("--workdir", default="/tmp/aas_biglex_hard",
                   help="biglex-hard corpus + word{2,3}.arpa from trigram_fusion_eval")
    p.add_argument("--result", default="biglex_hard_fusion_r4.json")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--beam-width", type=int, default=32)
    args = p.parse_args()
    t0 = time.time()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.decode.arpa import ArpaWordLM
    from aas_enhancement_tpu.decode.tune import grid_search_lm
    from aas_enhancement_tpu.evaluation import evaluate_wer

    with open(args.flagship, "rb") as f:
        flag = pickle.load(f)
    cfg = Config.from_json(flag["cfg_json"])
    am_params, g_params = flag["am_params"], flag["g_params"]

    dev = os.path.join(args.workdir, "corpus_dev", "noisy_manifest.csv")
    test = os.path.join(args.workdir, "corpus_test", "noisy_manifest.csv")

    result = json.load(open(args.result))
    out = {}

    # Context legs: the flagship stack on the foreign lexicon, before fusion.
    out["wer_pipeline_noisy_greedy_test"] = evaluate_wer(
        cfg, am_params, test, batch_size=args.batch_size)["wer"]
    enh = evaluate_wer(cfg, am_params, test, g_params=g_params,
                       batch_size=args.batch_size)
    out["wer_pipeline_enh_greedy_test"] = enh["wer"]
    out["wer_pipeline_enh_greedy_test_ci95"] = enh.get("wer_ci95")
    out["sample_pipeline"] = {"ref": enh.get("sample_ref"),
                              "hyp_enhanced": enh.get("sample_hyp")}

    legs = {}
    for tag, order in (("bi", 2), ("tri", 3)):
        lm = ArpaWordLM.load_arpa(os.path.join(args.workdir, f"word{order}.arpa"))
        tuned = grid_search_lm(cfg, am_params, dev, lm, g_params=g_params,
                               batch_size=args.batch_size,
                               beam_width=args.beam_width)
        out[f"pipeline_lm_{tag}_alpha"] = tuned["alpha"]
        out[f"pipeline_lm_{tag}_beta"] = tuned["beta"]
        out[f"wer_pipeline_dev_beam_{tag}"] = tuned["wer"]
        out["wer_pipeline_dev_beam_no_lm"] = tuned["wer_no_lm"]
        legs[tag] = evaluate_wer(
            cfg, am_params, test, g_params=g_params,
            batch_size=args.batch_size, decoder="beam",
            beam_width=args.beam_width, lm=lm,
            lm_alpha=tuned["alpha"], lm_beta=tuned["beta"], per_utt=True)
        out[f"wer_pipeline_test_{tag}"] = legs[tag]["wer"]
        out[f"wer_pipeline_test_{tag}_ci95"] = legs[tag].get("wer_ci95")
        print(json.dumps({k: out[k] for k in out if tag in k or "greedy" in k}),
              flush=True)

    eb, et = legs["bi"].get("per_utt"), legs["tri"].get("per_utt")
    if eb and et:
        deltas = [t - b for b, t in zip(eb, et)]
        out["pipeline_paired"] = {
            "n": len(deltas),
            "tri_better": sum(1 for d in deltas if d < 0),
            "bi_better": sum(1 for d in deltas if d > 0),
            "ties": sum(1 for d in deltas if d == 0),
        }
    out["pipeline_trigram_win_abs"] = round(
        out["wer_pipeline_test_bi"] - out["wer_pipeline_test_tri"], 6)
    out["pipeline_wall_minutes"] = round((time.time() - t0) / 60.0, 1)
    out["pipeline_flagship"] = args.flagship

    result.update(out)
    with open(args.result, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
