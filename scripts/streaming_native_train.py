"""Streaming-NATIVE flagship training (VERDICT r4 #1b).

The round-4 live/offline gap attack was post-hoc: 300-step fine-tunes of
OFFLINE-trained nets through the deployment windowing, which measurably
trade offline quality and break the hybrid rescore's log-prob geometry
(streaming_finetune_r4.json, am_streaming_finetune_r4.json).  This script
instead makes streaming the training target from the start: the enhancer
(fresh init by default) trains under the FULL AAS objective with its forward
replaced by the deployed block-bidirectional windowing
(TrainConfig.streaming_finetune -> models/enhancer.blockwise_apply) at the
serving operating point, for the full flagship step budget — there is no
"offline model" to drift away from.

The AM stays the frozen offline-pre-trained one (the reference's AAS recipe;
live-chain AM adaptation is a separate, composable step:
scripts/am_streaming_finetune.py).

Measures greedy WER before heavy evals: offline-forward and
streamed-features (StreamingEnhancer at the same point -> offline AM) on the
held-out test split, vs the workdir's offline-trained G anchors.  Saves a
train-CLI checkpoint (config records the operating point, so
`serve --weights auto` and `live_pipeline_eval --g-checkpoint` compose).

Usage:
  python scripts/streaming_native_train.py --workdir /tmp/aas_e2e_full_hard \
      --steps 1000 [--chunk 1.0 --lookahead 0.5 --history 0.5] \
      [--init scratch|trained] [--out r.json]
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
    p.add_argument("--workdir", required=True)
    p.add_argument("--steps", type=int, default=1000,
                   help="full flagship AAS budget, not a 300-step patch")
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--lookahead", type=float, default=0.5)
    p.add_argument("--history", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--init", choices=("scratch", "trained"), default="scratch",
                   help="G/D init: fresh (streaming-native, default) or the "
                        "workdir's offline-trained weights (long blockwise "
                        "continuation at full lr)")
    p.add_argument("--seed", type=int, default=31)
    p.add_argument("--save-checkpoint", default="",
                   help="train-CLI checkpoint dir for the streaming-native G;"
                        " default <workdir>/ck_g_stream_native, '-' to skip")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import jax
    import numpy as np
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.data.wav import read_wav, write_wav
    from aas_enhancement_tpu.evaluation import evaluate_wer, make_eval_forward
    from aas_enhancement_tpu.streaming import StreamingEnhancer
    from aas_enhancement_tpu.train.loop import init_state, train

    wd = args.workdir
    with open(os.path.join(wd, "sweep_state.json")) as f:
        meta = json.load(f)
    with open(meta["params_pkl"], "rb") as f:
        saved = pickle.load(f)
    cfg = Config.from_json(saved["cfg_json"])
    am_params = saved["am_params"]
    g_offline = saved["g_params"]

    t0 = time.time()
    result = {"steps": args.steps, "init": args.init, "chunk_s": args.chunk,
              "lookahead_s": args.lookahead, "history_s": args.history}

    fwd_plain = make_eval_forward(cfg, use_enhancer=False)
    fwd_enh = make_eval_forward(cfg, use_enhancer=True)

    def wer_offline(mani, g_p):
        return evaluate_wer(cfg, am_params, mani, g_params=g_p,
                            batch_size=args.batch_size, forward=fwd_enh)["wer"]

    def streamed_manifest(tag, manifest, g_p):
        """Stream G at the operating point -> enhanced-wav manifest (the
        offline mirror of the deployed feature distribution — same pattern
        as scripts/am_streaming_finetune.py)."""
        sdir = os.path.join(wd, f"stream_native_{tag}")
        os.makedirs(sdir, exist_ok=True)
        lines = []
        for line in open(manifest).read().splitlines():
            wav_path, txt_path = line.split(",")
            wav, sr = read_wav(wav_path)
            eng = StreamingEnhancer(cfg, g_p, chunk_seconds=args.chunk,
                                    lookahead_seconds=args.lookahead,
                                    history_seconds=args.history)
            out = np.concatenate([eng.feed(wav), eng.flush()])
            spath = os.path.join(sdir, os.path.basename(wav_path))
            write_wav(spath, out[: len(wav)], sr)
            lines.append(f"{spath},{txt_path}")
        smani = os.path.join(sdir, "manifest.csv")
        with open(smani, "w") as f:
            f.write("\n".join(lines) + "\n")
        return smani

    def wer_streamed(tag, mani, g_p):
        return evaluate_wer(cfg, am_params, streamed_manifest(tag, mani, g_p),
                            batch_size=args.batch_size,
                            forward=fwd_plain)["wer"]

    # Anchors: the workdir's offline-trained G at the same operating point.
    result["wer_offline_test_anchor"] = wer_offline(meta["test_noisy"],
                                                    g_offline)
    result["wer_streamed_feats_test_anchor"] = wer_streamed(
        "anchor", meta["test_noisy"], g_offline)

    # Streaming-native AAS training: the one jitted joint step, G's forward
    # blockwise at the deployment point throughout.
    tr_cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, objective="aas", streaming_finetune=True,
        streaming_finetune_am=False, am_through_enhancer=False,
        stream_chunk_s=args.chunk, stream_lookahead_s=args.lookahead,
        stream_history_s=args.history, batch_size=args.batch_size,
        epochs=100000, spec_augment=False))
    tr_cfg = tr_cfg.replace(data=dataclasses.replace(tr_cfg.data,
                                                     val_manifest=""))
    state = init_state(tr_cfg, jax.random.key(args.seed), am_params=am_params)
    if args.init == "trained":
        state = state.replace(g_params=g_offline,
                              d_params=saved["state"].d_params)
    state2, recs = train(tr_cfg, meta["train_noisy"], meta["train_clean"],
                         max_steps=args.steps, state=state)
    ctc = [r["loss_ctc"] for r in recs if "loss_ctc" in r]
    if ctc:
        result["ctc_first"], result["ctc_last"] = ctc[0], ctc[-1]

    g_native = jax.device_get(state2.g_params)
    result["wer_offline_test"] = wer_offline(meta["test_noisy"], g_native)
    result["wer_streamed_feats_test"] = wer_streamed(
        "native", meta["test_noisy"], g_native)
    result["wer_streamed_feats_dev"] = wer_streamed(
        "native_dev", meta["dev_noisy"], g_native)
    result["streamed_improvement_vs_offline_g"] = (
        result["wer_streamed_feats_test_anchor"]
        - result["wer_streamed_feats_test"])

    if args.save_checkpoint != "-":
        from aas_enhancement_tpu.utils import checkpoint as ckpt
        ck_dir = args.save_checkpoint or os.path.join(wd,
                                                      "ck_g_stream_native")
        os.makedirs(ck_dir, exist_ok=True)
        with open(os.path.join(ck_dir, "config.json"), "w") as f:
            f.write(tr_cfg.to_json())
        mgr = ckpt.make_manager(ck_dir)
        ckpt.save(mgr, int(state2.step), jax.device_get(state2))
        mgr.close()
        result["checkpoint_dir"] = ck_dir

    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)
    out = args.out or os.path.join(wd, "streaming_native_train.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
