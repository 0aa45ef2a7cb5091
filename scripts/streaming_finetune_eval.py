"""Streaming-aware fine-tuning experiment (VERDICT r2 #3).

Loads the trained AAS pipeline from an e2e_demo workdir, measures streamed
held-out WER at the deployment operating point, fine-tunes the enhancer for a
few hundred AAS steps THROUGH the block-bidirectional streaming forward
(TrainConfig.streaming_finetune -> models/enhancer.blockwise_apply with the
same chunk/lookahead/history), and re-measures — the before/after streamed
WER is the experiment's result, written as JSON.

Usage:
  python scripts/e2e_demo.py --workdir /tmp/aas_e2e_hard --snr-low -7 ...
  python scripts/streaming_finetune_eval.py --workdir /tmp/aas_e2e_hard \
      --steps 200 --out /tmp/stream_ft.json
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import pickle
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aas_e2e")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--lookahead", type=float, default=0.2)
    p.add_argument("--history", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr-scale", type=float, default=0.5,
                   help="fine-tune G at lr_g * this (keep D/AM lrs)")
    p.add_argument("--save-checkpoint", default="",
                   help="also write the fine-tuned state as a train-CLI "
                        "checkpoint dir (servable via `serve "
                        "--streaming-checkpoint`); default "
                        "<workdir>/ck_stream_ft, '-' to skip")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import numpy as np
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.data.wav import read_wav, write_wav
    from aas_enhancement_tpu.evaluation import evaluate_wer, make_eval_forward
    from aas_enhancement_tpu.streaming import StreamingEnhancer
    from aas_enhancement_tpu.train.loop import train

    wd = args.workdir
    with open(os.path.join(wd, "sweep_state.json")) as f:
        meta = json.load(f)
    with open(meta["params_pkl"], "rb") as f:
        saved = pickle.load(f)
    cfg = Config.from_json(saved["cfg_json"])
    am_params = saved["am_params"]
    state = saved["state"]

    fwd_plain = make_eval_forward(cfg, use_enhancer=False)

    def streamed_wer(g_params, tag):
        sdir = os.path.join(wd, f"ft_stream_{tag}")
        os.makedirs(sdir, exist_ok=True)
        lines = []
        for line in open(meta["test_noisy"]).read().splitlines():
            wav_path, txt_path = line.split(",")
            wav, sr = read_wav(wav_path)
            eng = StreamingEnhancer(cfg, g_params, chunk_seconds=args.chunk,
                                    lookahead_seconds=args.lookahead,
                                    history_seconds=args.history)
            out = np.concatenate([eng.feed(wav), eng.flush()])
            spath = os.path.join(sdir, os.path.basename(wav_path))
            write_wav(spath, out[: len(wav)], sr)
            lines.append(f"{spath},{txt_path}")
        smanifest = os.path.join(sdir, "manifest.csv")
        with open(smanifest, "w") as f:
            f.write("\n".join(lines) + "\n")
        return evaluate_wer(cfg, am_params, smanifest,
                            batch_size=args.batch_size,
                            forward=fwd_plain)["wer"]

    t0 = time.time()
    result = {"steps": args.steps, "chunk_s": args.chunk,
              "lookahead_s": args.lookahead, "history_s": args.history}
    fwd_enh = make_eval_forward(cfg, use_enhancer=True)
    result["wer_offline_before"] = evaluate_wer(
        cfg, am_params, meta["test_noisy"], g_params=saved["g_params"],
        batch_size=args.batch_size, forward=fwd_enh)["wer"]
    result["wer_streamed_before"] = streamed_wer(saved["g_params"], "before")

    # Fine-tune through the block-bidirectional forward, continuing from the
    # saved optimizer state; the windowing matches the deployment point.
    ft_cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, streaming_finetune=True, stream_chunk_s=args.chunk,
        stream_lookahead_s=args.lookahead, stream_history_s=args.history,
        lr_g=cfg.train.lr_g * args.lr_scale, batch_size=args.batch_size))
    target = int(state.step) + args.steps
    state2, recs = train(ft_cfg, meta["train_noisy"], meta["train_clean"],
                         max_steps=target, state=state)
    result["ft_loss_first"] = next(r["loss_g"] for r in recs if "loss_g" in r)
    result["ft_loss_last"] = [r["loss_g"] for r in recs if "loss_g" in r][-1]

    import jax

    # Persist the fine-tuned state as a train-CLI checkpoint: this is the
    # artifact `cli/serve.py --streaming-checkpoint` loads for its
    # `--weights auto` transcribe-mode pick (the serve docstring names this
    # script as the source).
    if args.save_checkpoint != "-":
        from aas_enhancement_tpu.utils import checkpoint as ckpt
        ck_dir = args.save_checkpoint or os.path.join(wd, "ck_stream_ft")
        os.makedirs(ck_dir, exist_ok=True)
        with open(os.path.join(ck_dir, "config.json"), "w") as f:
            f.write(ft_cfg.to_json())
        mgr = ckpt.make_manager(ck_dir)
        ckpt.save(mgr, int(state2.step), jax.device_get(state2))
        mgr.close()
        result["checkpoint_dir"] = ck_dir

    g_ft = jax.device_get(state2.g_params)
    result["wer_streamed_after"] = streamed_wer(g_ft, "after")
    result["wer_offline_after"] = evaluate_wer(
        cfg, am_params, meta["test_noisy"], g_params=g_ft,
        batch_size=args.batch_size, forward=fwd_enh)["wer"]
    result["streamed_improvement"] = (result["wer_streamed_before"]
                                      - result["wer_streamed_after"])
    result["penalty_before"] = (result["wer_streamed_before"]
                                - result["wer_offline_before"])
    result["penalty_after"] = (result["wer_streamed_after"]
                               - result["wer_offline_after"])
    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)

    out = args.out or os.path.join(wd, "streaming_finetune.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
