"""`train` entry point — all objectives behind one CLI.

Reference parity: the per-experiment train scripts (SURVEY.md §2 "Train: acoustic
model" / "Train: AAS joint" / "Train: ablation modes", L6 entry points) collapsed
into one command with --objective selecting the driver config:

  paired       config 2 (BASELINE.json:8)   L1 mapping, needs --clean-manifest (paired)
  adversarial  config 3 (BASELINE.json:9)   GAN, needs --clean-manifest (unpaired)
  acoustic     config 4 (BASELINE.json:10)  frozen-AM CTC, needs --am-checkpoint
  aas          config 5 (BASELINE.json:11)  joint, needs both
  am           AM CTC pre-training (SURVEY.md §3.1)

Usage:
  python -m aas_enhancement_tpu.cli.train --objective paired \
      --noisy-manifest noisy.csv --clean-manifest clean.csv --steps 100
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.train.loop import init_state, train


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--objective", required=True,
                   choices=["paired", "adversarial", "acoustic", "aas", "am"])
    p.add_argument("--noisy-manifest", required=True,
                   help="training manifest (clean manifest for --objective am)")
    p.add_argument("--clean-manifest",
                   help="paired clean manifest (paired) / unpaired clean corpus (adv, aas)")
    p.add_argument("--am-checkpoint",
                   help="pre-trained AM checkpoint dir (supervision for acoustic/aas; "
                        "decode-only validation AM for other objectives)")
    p.add_argument("--config", help="config JSON file")
    p.add_argument("--steps", type=int, default=0, help="stop after N steps (0 = epochs)")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--grad-accum", type=int, default=0,
                   help="split each batch into k microbatches inside the one "
                        "jitted step (effective batches past the VMEM ceiling)")
    p.add_argument("--lambda-adv", type=float, default=None)
    p.add_argument("--log-every", type=int, default=0)
    p.add_argument("--val-manifest",
                   help="dev manifest: periodic greedy-WER validation + best-WER "
                        "checkpoint selection")
    p.add_argument("--eval-every", type=int, default=-1,
                   help="validate every N steps (0 = each epoch end)")
    p.add_argument("--lr-anneal", type=float, default=None,
                   help="per-epoch LR divisor, e.g. 1.1 (deepspeech recipe)")
    p.add_argument("--spec-augment", action="store_true",
                   help="SpecAugment time+freq masking on AM-pretrain "
                        "features (objective am)")
    p.add_argument("--sortagrad", action="store_true",
                   help="serve epoch 0 strictly shortest-first")
    p.add_argument("--streaming-finetune", action="store_true",
                   help="train G through the block-bidirectional streaming "
                        "forward (chunk/lookahead/history from the config or "
                        "the --stream-* flags) so chunked inference matches "
                        "training; with --g-checkpoint this is the measured-"
                        "best blockwise-continuation recipe "
                        "(streaming_native_cont_r5.json)")
    p.add_argument("--stream-chunk", type=float, default=None,
                   help="streaming operating point: chunk seconds "
                        "(TrainConfig.stream_chunk_s)")
    p.add_argument("--stream-lookahead", type=float, default=None,
                   help="streaming operating point: lookahead seconds")
    p.add_argument("--stream-history", type=float, default=None,
                   help="streaming operating point: history seconds")
    p.add_argument("--streaming-finetune-am", action="store_true",
                   help="objective am: train through the block-streaming AM "
                        "forward (models/am.am_blockwise_apply) — live-"
                        "deployment AM adaptation")
    p.add_argument("--am-through-enhancer", action="store_true",
                   help="objective am: feed the AM the FROZEN enhancer's "
                        "output features instead of the raw input "
                        "(deployment-distribution adaptation); supply the "
                        "enhancer weights with --g-checkpoint")
    p.add_argument("--g-checkpoint",
                   help="trained enhancer checkpoint dir — the frozen G for "
                        "--am-through-enhancer, or the warm-start init for "
                        "generator objectives (paired/adversarial/acoustic/"
                        "aas); for adversarial/aas the checkpoint's "
                        "discriminator is carried too (blockwise continuation "
                        "resumes the full GAN state)")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--continue-from", dest="resume", action="store_true",
                   help="resume from the latest checkpoint in --checkpoint-dir")
    p.add_argument("--metrics", help="JSONL metrics path")
    p.add_argument("--profile-dir",
                   help="capture a jax.profiler trace of a few steady-state "
                        "steps into this dir (XProf/Perfetto)")
    p.add_argument("--tensorboard", help="TensorBoard log dir (needs tensorflow)")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    cfg = Config.from_json(open(args.config).read()) if args.config else Config()
    tr = {"objective": args.objective}
    if args.epochs:
        tr["epochs"] = args.epochs
    if args.batch_size:
        tr["batch_size"] = args.batch_size
    if args.grad_accum:
        tr["grad_accum"] = args.grad_accum
    if args.lambda_adv is not None:
        tr["lambda_adv"] = args.lambda_adv
    if args.log_every:
        tr["log_every"] = args.log_every
    if args.eval_every >= 0:
        tr["eval_every"] = args.eval_every
    if args.lr_anneal is not None:
        tr["lr_anneal"] = args.lr_anneal
    if args.sortagrad:
        tr["sortagrad"] = True
    if args.spec_augment:
        tr["spec_augment"] = True
    if args.streaming_finetune:
        tr["streaming_finetune"] = True
    if args.streaming_finetune_am:
        tr["streaming_finetune_am"] = True
    if args.stream_chunk is not None:
        tr["stream_chunk_s"] = args.stream_chunk
    if args.stream_lookahead is not None:
        tr["stream_lookahead_s"] = args.stream_lookahead
    if args.stream_history is not None:
        tr["stream_history_s"] = args.stream_history
    if args.am_through_enhancer:
        if args.objective != "am":
            p.error("--am-through-enhancer only applies to --objective am")
        tr["am_through_enhancer"] = True
    if args.profile_dir:
        tr["profile_dir"] = args.profile_dir
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr))
    if args.val_manifest:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                   val_manifest=args.val_manifest))

    if args.objective in ("paired",) and not args.clean_manifest:
        p.error("--objective paired requires --clean-manifest (paired targets)")
    if args.objective in ("adversarial", "aas") and not args.clean_manifest:
        p.error(f"--objective {args.objective} requires --clean-manifest (unpaired corpus)")

    am_params = None
    if args.am_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        am_state, am_cfg = load_state(args.am_checkpoint)
        am_params = am_state.am_params
        if not am_params:
            p.error(f"{args.am_checkpoint}: checkpoint has no acoustic model "
                    f"(objective was {am_cfg.train.objective!r})")
        cfg = cfg.replace(am=am_cfg.am)  # frozen AM must keep its architecture
    elif args.objective in ("acoustic", "aas"):
        print("WARNING: no --am-checkpoint given; using a RANDOM-INIT frozen AM "
              "(fine for smoke tests, useless as supervision)", flush=True)

    g_params = None
    d_params = None
    if args.g_checkpoint:
        from aas_enhancement_tpu.train.loop import load_state
        g_state, g_cfg = load_state(args.g_checkpoint)
        g_params = g_state.g_params
        if not g_params:
            p.error(f"{args.g_checkpoint}: checkpoint has no enhancer "
                    f"(objective was {g_cfg.train.objective!r})")
        cfg = cfg.replace(enhancer=g_cfg.enhancer)  # frozen G keeps its arch
        if args.objective in ("adversarial", "aas") and g_state.d_params:
            d_params = g_state.d_params
            cfg = cfg.replace(discriminator=g_cfg.discriminator)
    elif args.am_through_enhancer:
        print("WARNING: --am-through-enhancer without --g-checkpoint; the "
              "frozen enhancer is RANDOM-INIT (fine for smoke tests, not a "
              "deployment distribution)", flush=True)

    state = init_state(cfg, jax.random.key(cfg.train.seed), am_params=am_params)
    if g_params is not None:
        state = state.replace(g_params=g_params)
    if d_params is not None:
        state = state.replace(d_params=d_params)

    if args.checkpoint_dir:
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        with open(os.path.join(args.checkpoint_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    state, records = train(
        cfg, args.noisy_manifest, args.clean_manifest,
        paired=(args.objective == "paired"),
        max_steps=args.steps,
        metrics_path=args.metrics,
        tensorboard_dir=args.tensorboard,
        checkpoint_dir=args.checkpoint_dir or None,
        resume=args.resume,
        state=state,
        eval_am_params=(am_params if args.objective in ("paired", "adversarial")
                        else None))

    final = next((r for r in reversed(records)
                  if any(k.startswith("loss") for k in r)), {})
    out = {"final_step": int(state.step),
           **{k: v for k, v in final.items() if k.startswith("loss")}}
    last_val = next((r for r in reversed(records) if "val_wer" in r), None)
    if last_val is not None:
        out["val_wer"] = last_val["val_wer"]
        if "val_wer_noisy" in last_val:
            out["val_wer_noisy"] = last_val["val_wer_noisy"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
