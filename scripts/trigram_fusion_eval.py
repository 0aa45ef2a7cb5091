"""Measured trigram-over-bigram word-LM fusion win (VERDICT r3 #1).

The round-3 rebuild truncated ARPA orders > 2; round 4's sparse n-gram store
fuses any order.  This script proves the capability MATTERS on dev/test, not
just in unit tests: on a corpus whose language has genuine order-3 structure
(`data/synthetic.py::Language(tri_classes>1)` — the successor distribution is
keyed on the previous word's CLASS as well as the current word), a trigram
ARPA LM must beat the bigram ARPA LM trained on the same text.

Protocol (mirrors the reference's KenLM workflow — LMs train on TEXT, not
audio; SURVEY.md §2 "NATIVE: ctcdecode"):
  1. trigram-structured corpora: TRAIN (multi-condition AM training),
     DEV (fusion-weight tuning), TEST (held out) — disjoint seeds.
  2. train the AM on the noisy TRAIN split (cli.train --objective am).
  3. sample a large TEXT-ONLY corpus from the same Language and fit
     stupid-backoff ARPA LMs at order 2 and order 3 (decode.arpa.fit_arpa);
     write both as .arpa files and RELOAD them from disk — the exact
     `evaluate --word-lm model.arpa` user path.
  4. grid-tune each LM's fusion weights on DEV, decode TEST with the tuned
     point, and record WER(greedy) / WER(beam, no LM) / WER(bi) / WER(tri).
  5. one literal `cli.evaluate --word-lm tri.arpa` invocation, captured into
     the artifact, so the user-facing CLI is the thing proven.

Writes trigram_fusion_r4.json.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import contextlib
import io
import json
import math
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aas_trigram")
    p.add_argument("--n-utts", type=int, default=384)
    p.add_argument("--n-dev-utts", type=int, default=48)
    p.add_argument("--n-test-utts", type=int, default=48)
    p.add_argument("--am-steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--tri-classes", type=int, default=3)
    p.add_argument("--lexicon-size", type=int, default=100,
                   help="Language lexicon size — 1000+ exercises the sparse "
                        "n-gram store at realistic vocabulary scale (the "
                        "text-only LM corpus must then cover the lexicon; "
                        "scale --lm-sentences with it)")
    p.add_argument("--lm-sentences", type=int, default=20000,
                   help="text-only LM training corpus size (the KenLM "
                        "pattern: LM text >> transcribed audio)")
    p.add_argument("--snr-low", type=float, default=0.0)
    p.add_argument("--snr-high", type=float, default=10.0)
    p.add_argument("--beam-width", type=int, default=32)
    p.add_argument("--out", default="trigram_fusion_r4.json")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import numpy as np
    from aas_enhancement_tpu.data.synthetic import (default_language,
                                                    generate_corpus)

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    t0 = time.time()
    result = {"n_utts": args.n_utts, "am_steps": args.am_steps,
              "tri_classes": args.tri_classes,
              "lexicon_size": args.lexicon_size,
              "lm_sentences": args.lm_sentences,
              "snr_range": [args.snr_low, args.snr_high]}
    out_path = args.out

    def save():
        result["wall_minutes_so_far"] = round((time.time() - t0) / 60.0, 1)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")

    corpus_kw = dict(snr_range=(args.snr_low, args.snr_high),
                     n_words=(3, 8), tri_classes=args.tri_classes,
                     lexicon_size=args.lexicon_size, reverb_prob=0.3)
    train_m = generate_corpus(os.path.join(wd, "corpus"), n_utts=args.n_utts,
                              seed=7, **corpus_kw)
    dev_m = generate_corpus(os.path.join(wd, "corpus_dev"),
                            n_utts=args.n_dev_utts, seed=104729, **corpus_kw)
    test_m = generate_corpus(os.path.join(wd, "corpus_test"),
                             n_utts=args.n_test_utts, seed=7919, **corpus_kw)

    # --- 2. multi-condition AM training (noisy input + transcripts) through
    # the train CLI, so evaluate --am-checkpoint works verbatim.
    from aas_enhancement_tpu.cli import train as cli_train
    from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                            TrainConfig)
    cfg = Config(am=AMConfig(rnn_hidden=256, rnn_layers=3, conv_channels=16),
                 # epochs is a backstop only — --steps is the budget (without
                 # the override, TrainConfig.epochs=10 caps a 384-utt/B=16 run
                 # at ~250 steps).
                 train=TrainConfig(objective="am", lr_am=6e-4, log_every=50,
                                   epochs=100000),
                 data=DataConfig(num_buckets=2))
    cfg_path = os.path.join(wd, "config.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    ckpt = os.path.join(wd, "ckpt_am")
    cli_train.main(["--objective", "am",
                    "--noisy-manifest", train_m["noisy"],
                    "--config", cfg_path,
                    "--steps", str(args.am_steps),
                    "--batch-size", str(args.batch_size),
                    "--checkpoint-dir", ckpt])
    save()

    # --- 3. text-only LM corpus from the SAME language; fit bigram + trigram.
    lang = default_language(0, size=args.lexicon_size,
                            tri_classes=args.tri_classes)
    rng = np.random.default_rng(424242)
    texts = [lang.sample_sentence(rng, n_words=(3, 8))
             for _ in range(args.lm_sentences)]
    from aas_enhancement_tpu.decode.arpa import ArpaWordLM, fit_arpa
    paths = {}
    for order in (2, 3):
        lm = fit_arpa(texts, order=order)
        paths[order] = os.path.join(wd, f"word{order}.arpa")
        lm.save_arpa(paths[order])
    bi = ArpaWordLM.load_arpa(paths[2])
    tri = ArpaWordLM.load_arpa(paths[3])
    assert bi.order == 2 and tri.order == 3

    # Held-out text likelihood: the order-3 structure must be REAL before any
    # decode claims (same diagnostic as test_synthetic's tri_gain).
    test_texts = [lang.sample_sentence(rng, n_words=(3, 8))
                  for _ in range(2000)]

    def logp_per_word(lm):
        tot, n = 0.0, 0
        for t in test_texts:
            words = t.split()
            for i, w in enumerate(words):
                ctx = tuple(words[max(0, i - lm.order + 1): i]) or None
                tot += lm.logp(w, ctx)
                n += 1
        return tot / n

    result["heldout_logp_per_word_bi"] = round(logp_per_word(bi), 4)
    result["heldout_logp_per_word_tri"] = round(logp_per_word(tri), 4)
    from aas_enhancement_tpu.decode import ngram
    result["export_mb"] = {
        "bi": round(ngram.export_nbytes(bi.export_native()) / 2**20, 3),
        "tri": round(ngram.export_nbytes(tri.export_native()) / 2**20, 3)}
    save()

    # --- 4. decode legs: greedy, beam no-LM, beam+bi, beam+tri.
    from aas_enhancement_tpu.decode.tune import grid_search_lm
    from aas_enhancement_tpu.evaluation import evaluate_wer
    from aas_enhancement_tpu.train.loop import load_state
    am_state, am_cfg = load_state(ckpt)
    am_params = am_state.am_params

    g = evaluate_wer(am_cfg, am_params, test_m["noisy"],
                     batch_size=args.batch_size)
    result["wer_greedy_test"] = g["wer"]
    result["wer_greedy_test_ci95"] = g.get("wer_ci95")
    nolm = evaluate_wer(am_cfg, am_params, test_m["noisy"],
                        batch_size=args.batch_size, decoder="beam",
                        beam_width=args.beam_width)
    result["wer_beam_nolm_test"] = nolm["wer"]
    save()

    for tag, lm in (("bi", bi), ("tri", tri)):
        tuned = grid_search_lm(am_cfg, am_params, dev_m["noisy"], lm,
                               batch_size=args.batch_size, beam_width=16)
        result[f"lm_{tag}_alpha"] = tuned["alpha"]
        result[f"lm_{tag}_beta"] = tuned["beta"]
        result[f"wer_dev_beam_{tag}"] = tuned["wer"]
        result["wer_dev_beam_no_lm"] = tuned["wer_no_lm"]
        r = evaluate_wer(am_cfg, am_params, test_m["noisy"],
                         batch_size=args.batch_size, decoder="beam",
                         beam_width=args.beam_width, lm=lm,
                         lm_alpha=tuned["alpha"], lm_beta=tuned["beta"])
        result[f"wer_test_{tag}"] = r["wer"]
        result[f"wer_test_{tag}_ci95"] = r.get("wer_ci95")
        save()

    result["trigram_win_abs"] = round(
        result["wer_test_bi"] - result["wer_test_tri"], 6)

    # --- 5. the literal user path: cli.evaluate --lm tri.arpa (word-LM-only
    # fusion rides --lm; --word-lm is the hybrid add-on) with the dev-tuned
    # weights, stdout captured as evidence.
    from aas_enhancement_tpu.cli import evaluate as cli_eval
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_eval.main(["--manifest", test_m["noisy"],
                       "--am-checkpoint", ckpt,
                       "--decoder", "beam",
                       "--beam-width", str(args.beam_width),
                       "--lm", paths[3],
                       "--lm-alpha", str(result["lm_tri_alpha"]),
                       "--lm-beta", str(result["lm_tri_beta"]),
                       "--batch-size", str(args.batch_size)])
    result["cli_evaluate_word_lm_tri"] = buf.getvalue().strip().splitlines()[-1]

    result.pop("wall_minutes_so_far", None)
    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
