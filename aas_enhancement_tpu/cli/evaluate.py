"""`evaluate` entry point: WER of the AM on a test manifest (noisy vs enhanced).

Reference parity (SURVEY.md §2 "Evaluate entry point", §3.4): run the acoustic model
with greedy decode over a manifest, compute corpus WER/CER; optionally enhance first
and report the WER delta — the north-star quality metric (BASELINE.json:2).

Usage:
  python -m aas_enhancement_tpu.cli.evaluate --manifest test.csv \
      --am-checkpoint ckpt_am/ [--enhancer-checkpoint ckpt_g/] [--config cfg.json]
"""

from __future__ import annotations

import argparse
import json

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.evaluation import evaluate_wer  # noqa: F401 (re-export)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--am-checkpoint", required=True)
    p.add_argument("--enhancer-checkpoint",
                   help="if given, also report WER on enhanced input + delta")
    p.add_argument("--config", help="config JSON")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--decoder", choices=["greedy", "beam", "device"],
                   default="greedy",
                   help="'beam' = host C++/python prefix beam (any LM mode); "
                        "'device' = batched on-accelerator beam (no-LM or "
                        "char-LM fusion; decode/device_beam.py)")
    p.add_argument("--beam-width", type=int, default=32)
    p.add_argument("--lm", help="LM json for beam fusion (char or word n-gram, "
                                "decode/lm.py — train with cli.train_lm)")
    p.add_argument("--lm-alpha", type=float, default=0.5, help="LM weight")
    p.add_argument("--lm-beta", type=float, default=0.0,
                   help="insertion bonus (per symbol for char LMs, per "
                        "completed word for word LMs)")
    p.add_argument("--word-lm",
                   help="word n-gram LM json fused IN ADDITION to --lm "
                        "(hybrid char+word shallow fusion, the measured-best "
                        "decode mode)")
    p.add_argument("--word-alpha", type=float, default=0.5,
                   help="word-LM weight (hybrid fusion)")
    p.add_argument("--word-beta", type=float, default=0.0,
                   help="per-completed-word bonus (hybrid fusion)")
    p.add_argument("--tune-lm-manifest",
                   help="dev manifest: grid-search lm alpha/beta (and "
                        "word-LM weights when --word-lm is set) on it first "
                        "and use the best point (reports the grid)")
    p.add_argument("--clean-manifest",
                   help="paired clean manifest: also report SI-SNR (dB) of "
                        "noisy and enhanced waveforms vs the clean references")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    cfg = Config.from_json(open(args.config).read()) if args.config else Config()

    from aas_enhancement_tpu.train.loop import load_state
    am_state, am_cfg = load_state(args.am_checkpoint)
    am_params = am_state.am_params
    if not am_params:
        raise SystemExit(f"{args.am_checkpoint}: checkpoint has no acoustic model "
                         f"(objective was {am_cfg.train.objective!r})")
    if not args.config:
        cfg = cfg.replace(am=am_cfg.am, audio=am_cfg.audio)

    lm, word_lm = None, None
    if args.lm:
        from aas_enhancement_tpu.decode.lm import load_lm
        lm = load_lm(args.lm)
    if args.word_lm:
        from aas_enhancement_tpu.decode.lm import load_lm
        word_lm = load_lm(args.word_lm)
        if not getattr(word_lm, "is_word_lm", False):
            raise SystemExit(f"{args.word_lm}: --word-lm must be a WORD "
                             "n-gram LM (train with cli.train_lm --word)")
        if lm is None:
            raise SystemExit("--word-lm fuses in addition to a char --lm; "
                             "for word-LM-only fusion pass it as --lm")
    if args.decoder == "device" and (
            word_lm is not None
            or (lm is not None and getattr(lm, "is_word_lm", False))):
        raise SystemExit("--decoder device supports char-LM fusion only; "
                         "word/hybrid fusion needs --decoder beam")

    g_params = None
    if args.enhancer_checkpoint:
        g_state, g_cfg = load_state(args.enhancer_checkpoint)
        g_params = g_state.g_params
        if not g_params:
            raise SystemExit(f"{args.enhancer_checkpoint}: checkpoint has no enhancer")
        cfg = cfg.replace(enhancer=g_cfg.enhancer)

    lm_alpha, lm_beta, tune_result = args.lm_alpha, args.lm_beta, None
    word_alpha, word_beta = args.word_alpha, args.word_beta
    if args.tune_lm_manifest:
        if lm is None:
            raise SystemExit("--tune-lm-manifest requires --lm")
        if word_lm is not None:
            from aas_enhancement_tpu.decode.tune import grid_search_hybrid
            tune_result = grid_search_hybrid(
                cfg, am_params, args.tune_lm_manifest, lm, word_lm,
                g_params=g_params, batch_size=args.batch_size,
                beam_width=args.beam_width)
            word_alpha = tune_result["word_alpha"]
            word_beta = tune_result["word_beta"]
        else:
            from aas_enhancement_tpu.decode.tune import grid_search_lm
            tune_result = grid_search_lm(cfg, am_params,
                                         args.tune_lm_manifest, lm,
                                         g_params=g_params,
                                         batch_size=args.batch_size,
                                         beam_width=args.beam_width)
        lm_alpha, lm_beta = tune_result["alpha"], tune_result["beta"]

    kw = dict(batch_size=args.batch_size, decoder=args.decoder,
              beam_width=args.beam_width, lm=lm, lm_alpha=lm_alpha,
              lm_beta=lm_beta)
    if word_lm is not None:
        kw.update(word_lm=word_lm, word_alpha=word_alpha,
                  word_beta=word_beta)
    result = {"noisy": evaluate_wer(cfg, am_params, args.manifest, **kw)}
    if tune_result is not None:
        result["lm_tuning"] = tune_result
    if g_params is not None:
        result["enhanced"] = evaluate_wer(cfg, am_params, args.manifest,
                                          g_params=g_params, **kw)
        result["wer_delta"] = result["enhanced"]["wer"] - result["noisy"]["wer"]
    if args.clean_manifest:
        from aas_enhancement_tpu.evaluation import evaluate_si_snr
        result["si_snr"] = evaluate_si_snr(
            cfg, args.manifest, args.clean_manifest, g_params=g_params)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
