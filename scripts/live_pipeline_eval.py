"""TRUE live-pipeline WER: streaming enhancer -> streaming AM -> greedy /
beam+LM rescore, from a trained e2e workdir.

The round-3 "deployment mode" measurement (hybrid_fusion_r3.json
streamed_deployment_mode) streamed the ENHANCEMENT but still ran the
acoustic model offline over the full streamed waveform.  This script closes
the loop: audio goes through StreamingRecognizer (streaming_asr.py) — both
networks block-streaming with running normalization — and the session's
emitted log-probs are decoded greedily (the live transcript) and rescored
with the tuned char+word hybrid beam (the final-transcript mode).  Fusion
weights are tuned on the DEV split under the SAME live condition.

Usage: python scripts/live_pipeline_eval.py --workdir /tmp/aas_e2e_r3 \
           [--cpu] [--chunk 1.0] [--lookahead 0.2] [--history 0.5] \
           [--order 4] [--beam-width 16] [--out result.json]
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
    p.add_argument("--workdir", required=True)
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--lookahead", type=float, default=0.2)
    p.add_argument("--history", type=float, default=0.5)
    p.add_argument("--order", type=int, default=4)
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--prune-k", type=int, default=8)
    p.add_argument("--feed-seconds", type=float, default=0.1)
    p.add_argument("--g-checkpoint", default="",
                   help="serve enhancer weights from this train-CLI "
                        "checkpoint dir instead of the workdir pickle "
                        "(e.g. the streaming-finetuned ck_stream_ft from "
                        "scripts/streaming_finetune_eval.py — measures the "
                        "serve `--weights streaming` live stack)")
    p.add_argument("--am-checkpoint", default="",
                   help="serve AM weights from this train-CLI checkpoint dir "
                        "(e.g. the live-adapted ck_am_stream_ft from "
                        "scripts/am_streaming_finetune.py)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="")
    grids = p.add_argument_group(
        "fusion tune grids (comma-separated floats; the r5 live runs found "
        "the best point ON the default grid edges — widen these when that "
        "happens)")
    grids.add_argument("--alpha-grid", default="0.3,0.6,1.0,1.5")
    grids.add_argument("--beta-grid", default="-0.5,0.0,0.5,1.0")
    grids.add_argument("--word-alpha-grid", default="0.3,0.6,1.0")
    grids.add_argument("--word-beta-grid", default="0.0,0.5,1.0")
    args = p.parse_args()
    g_alpha = [float(x) for x in args.alpha_grid.split(",")]
    g_beta = [float(x) for x in args.beta_grid.split(",")]
    g_walpha = [float(x) for x in args.word_alpha_grid.split(",")]
    g_wbeta = [float(x) for x in args.word_beta_grid.split(",")]

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.data.wav import read_wav
    from aas_enhancement_tpu.decode.beam import beam_decode
    from aas_enhancement_tpu.decode.lm import CharNGramLM, WordNGramLM
    from aas_enhancement_tpu.decode.wer import corpus_wer, corpus_wer_ci
    from aas_enhancement_tpu.streaming_asr import StreamingRecognizer
    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    state = json.load(open(os.path.join(args.workdir, "sweep_state.json")))
    with open(state["params_pkl"], "rb") as f:
        trained = pickle.load(f)
    cfg = Config.from_json(trained["cfg_json"])
    am, g = trained["am_params"], trained["g_params"]
    if args.g_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        ft_state, _ = load_state(args.g_checkpoint)
        g = jax.device_get(ft_state.g_params)
    if args.am_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        am_state, _ = load_state(args.am_checkpoint)
        am = jax.device_get(am_state.am_params)

    sr = cfg.audio.sample_rate
    step = int(args.feed_seconds * sr)

    def stream_split(manifest):
        """-> (refs, greedy transcripts, per-utt [T, V] live log-probs)."""
        refs, greedy, lps = [], [], []
        for line in open(manifest).read().splitlines():
            wav_path, txt_path = line.split(",")
            wav, _ = read_wav(wav_path)
            rec = StreamingRecognizer(
                cfg, am, g_params=g, chunk_seconds=args.chunk,
                lookahead_seconds=args.lookahead,
                history_seconds=args.history, collect_logits=True)
            for i in range(0, len(wav), step):
                rec.feed(wav[i: i + step])
            rec.flush()
            refs.append(open(txt_path).read().strip())
            greedy.append(rec.transcript())
            lps.append(rec.log_probs())
        return refs, greedy, lps

    t0 = time.time()
    result = {"workdir": args.workdir, "g_checkpoint": args.g_checkpoint,
              "am_checkpoint": args.am_checkpoint,
              "chunk_s": args.chunk,
              "lookahead_s": args.lookahead, "history_s": args.history,
              "latency_s": args.chunk + args.lookahead,
              "beam_width": args.beam_width, "prune_k": args.prune_k,
              "grids": {"alpha": g_alpha, "beta": g_beta,
                        "word_alpha": g_walpha, "word_beta": g_wbeta}}

    clm = CharNGramLM.from_manifests([state["train_noisy"]], order=args.order)
    wlm = WordNGramLM.from_manifests([state["train_noisy"]])

    def hybrid_wer(lps, refs, pt):
        hyps = [beam_decode(lp[None], None, beam_width=args.beam_width,
                            prune_k=args.prune_k, lm=clm,
                            lm_alpha=pt["alpha"], lm_beta=pt["beta"],
                            word_lm=wlm, word_alpha=pt["word_alpha"],
                            word_beta=pt["word_beta"])[0] for lp in lps]
        return corpus_wer(refs, hyps)

    # Tune hybrid fusion on DEV under the live condition (coordinate grid,
    # same shape as decode/tune.grid_search_hybrid but over live log-probs).
    dev_refs, dev_greedy, dev_lps = stream_split(state["dev_noisy"])
    result["dev_greedy"] = corpus_wer(dev_refs, dev_greedy)
    from aas_enhancement_tpu.decode.tune import edge_refine

    best_c, wer_c = (0.0, 0.0), result["dev_greedy"]
    for a_ in g_alpha:
        for b_ in g_beta:
            w = hybrid_wer(dev_lps, dev_refs,
                           {"alpha": a_, "beta": b_, "word_alpha": 0.0,
                            "word_beta": 0.0})
            if w < wer_c:
                best_c, wer_c = (a_, b_), w
    if best_c[0] > 0.0:
        ca, cb, wer_c = edge_refine(
            lambda a_, b_: hybrid_wer(dev_lps, dev_refs,
                                      {"alpha": a_, "beta": b_,
                                       "word_alpha": 0.0, "word_beta": 0.0}),
            best_c[0], best_c[1], wer_c, g_alpha, g_beta)
        best_c = (ca, cb)
    best = {"alpha": best_c[0], "beta": best_c[1],
            "word_alpha": 0.0, "word_beta": 0.0}
    wer_h = wer_c
    for wa in g_walpha:
        for wb in g_wbeta:
            pt = {**best, "word_alpha": wa, "word_beta": wb}
            w = hybrid_wer(dev_lps, dev_refs, pt)
            if w < wer_h:
                best, wer_h = pt, w
    if best["word_alpha"] > 0.0:
        wa, wb, wer_h = edge_refine(
            lambda wa_, wb_: hybrid_wer(dev_lps, dev_refs,
                                        {**best, "word_alpha": wa_,
                                         "word_beta": wb_}),
            best["word_alpha"], best["word_beta"], wer_h,
            g_walpha, g_wbeta, a_key="word_alpha", b_key="word_beta")
        best = {**best, "word_alpha": wa, "word_beta": wb}
    result["tuned"] = {**best, "dev_wer": wer_h, "dev_wer_char_only": wer_c}

    # Held-out test split, live.
    refs, greedy, lps = stream_split(state["test_noisy"])
    wg, lo, hi = corpus_wer_ci(refs, greedy)
    result["live_greedy_test"] = wg
    result["live_greedy_test_ci95"] = [lo, hi]
    result["live_hybrid_test"] = hybrid_wer(lps, refs, best)
    result["utterances"] = len(refs)
    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
