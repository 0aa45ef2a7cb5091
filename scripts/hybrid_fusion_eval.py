"""Hybrid char+word LM fusion evaluation from a trained e2e workdir.

Reproduces `hybrid_fusion_r3.json` (BASELINE.md "Hybrid char+word LM
fusion"): loads the pipeline `scripts/e2e_demo.py` persisted
(sweep_state.json + trained_params.pkl), trains the char n-gram and word
bigram on TRAIN transcripts, tunes single-LM and hybrid fusion on the DEV
split (`decode/tune.py`), and reports greedy / char / word / hybrid WER on
the held-out TEST split.  Decode is host-side; pass --cpu to also run the
AM(+G) forward on the CPU backend (works when the TPU tunnel is down).

Usage: python scripts/hybrid_fusion_eval.py --workdir /tmp/aas_e2e_r3 \
           [--order 4] [--cpu] [--out result.json]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True,
                   help="e2e_demo workdir (has sweep_state.json)")
    p.add_argument("--order", type=int, default=4, help="char n-gram order")
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--prune-k", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--am-checkpoint", default="",
                   help="evaluate with the AM from this train-CLI checkpoint "
                        "dir instead of the workdir pickle's (e.g. the "
                        "co-adapted ck_am_offline_ft from "
                        "scripts/am_streaming_finetune.py --offline)")
    p.add_argument("--g-checkpoint", default="",
                   help="evaluate with the enhancer from this train-CLI "
                        "checkpoint dir instead of the workdir pickle's "
                        "(e.g. the alternated ck_g_coadapt from "
                        "scripts/coadapt_alternate.py)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (axon.register overrides the "
                        "JAX_PLATFORMS env var, so this sets the config)")
    p.add_argument("--out", default="")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.decode.beam import beam_decode
    from aas_enhancement_tpu.decode.lm import CharNGramLM, WordNGramLM
    from aas_enhancement_tpu.decode.tune import (cache_log_probs,
                                                 grid_search_hybrid)
    from aas_enhancement_tpu.decode.wer import corpus_wer
    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    state = json.load(open(os.path.join(args.workdir, "sweep_state.json")))
    with open(state["params_pkl"], "rb") as f:
        trained = pickle.load(f)
    cfg = Config.from_json(trained["cfg_json"])
    am, g = trained["am_params"], trained["g_params"]
    if args.am_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        am_state, _ = load_state(args.am_checkpoint)
        am = jax.device_get(am_state.am_params)
    if args.g_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        g_state, _ = load_state(args.g_checkpoint)
        g = jax.device_get(g_state.g_params)

    clm = CharNGramLM.from_manifests([state["train_noisy"]], order=args.order)
    wlm = WordNGramLM.from_manifests([state["train_noisy"]])

    tuned = grid_search_hybrid(cfg, am, state["dev_noisy"], clm, wlm,
                               g_params=g, batch_size=args.batch_size,
                               beam_width=args.beam_width)

    refs, lps = cache_log_probs(cfg, am, state["test_noisy"], g_params=g,
                                batch_size=args.batch_size)

    def test_wer(**kw):
        hyps = [beam_decode(lp[None], None, beam_width=args.beam_width,
                            prune_k=args.prune_k, **kw)[0] for lp in lps]
        return corpus_wer(refs, hyps)

    result = {
        "workdir": args.workdir, "char_order": args.order,
        "beam_width": args.beam_width, "prune_k": args.prune_k,
        "am_checkpoint": args.am_checkpoint,
        "g_checkpoint": args.g_checkpoint,
        "tuning": {k: tuned[k] for k in ("alpha", "beta", "word_alpha",
                                         "word_beta", "wer", "wer_char_only",
                                         "wer_no_lm")},
        "wer_test_greedy": test_wer(),
        "wer_test_char": test_wer(lm=clm, lm_alpha=tuned["alpha"],
                                  lm_beta=tuned["beta"]),
        "wer_test_hybrid": test_wer(lm=clm, lm_alpha=tuned["alpha"],
                                    lm_beta=tuned["beta"], word_lm=wlm,
                                    word_alpha=tuned["word_alpha"],
                                    word_beta=tuned["word_beta"]),
        "utterances_test": len(refs),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
