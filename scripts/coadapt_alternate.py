"""Block-coordinate co-adaptation: re-fine-tune G against the ADAPTED AM.

Second half of the round-4 co-adaptation loop.  `am_streaming_finetune.py
--offline` adapts the AM to the frozen enhancer's output distribution
(harsh flagship: hybrid 5.88% -> 5.04%).  This script runs the complementary
coordinate step: the enhancer fine-tunes under the frozen-AM CTC objective
(reference config 4, "acoustic") where the frozen AM is now the CO-ADAPTED
one — each network takes one descent block against the other's latest
weights, without the degenerate solutions a fully-joint unfrozen pair
invites (the reference froze the AM for exactly that reason).

Measures greedy offline WER (dev/test) for the (G', adapted-AM) pair and the
cross-pairing (G', base-AM) anchor; saves G' as a train-CLI checkpoint so
`hybrid_fusion_eval.py --g-checkpoint --am-checkpoint` can run the full
decode stack on the alternated pair.

Usage:
  python scripts/coadapt_alternate.py --workdir /tmp/aas_e2e_full_hard \
      [--am-checkpoint <wd>/ck_am_offline_ft] [--steps 300] [--out r.json]
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
    p.add_argument("--am-checkpoint", default="",
                   help="co-adapted AM (default <workdir>/ck_am_offline_ft)")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr-scale", type=float, default=0.1,
                   help="fine-tune G at lr_g * this")
    p.add_argument("--save-checkpoint", default="",
                   help="write G' as a train-CLI checkpoint dir; default "
                        "<workdir>/ck_g_coadapt, '-' to skip")
    p.add_argument("--g-init", default="",
                   help="train-CLI checkpoint whose g_params seed the G "
                        "coordinate step instead of the workdir's offline G "
                        "— block >=2 of the alternating co-adaptation loop "
                        "continues the previous block's G")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import jax
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.evaluation import evaluate_wer, make_eval_forward
    from aas_enhancement_tpu.train.loop import init_state, load_state, train

    wd = args.workdir
    with open(os.path.join(wd, "sweep_state.json")) as f:
        meta = json.load(f)
    with open(meta["params_pkl"], "rb") as f:
        saved = pickle.load(f)
    cfg = Config.from_json(saved["cfg_json"])
    am_base, g0 = saved["am_params"], saved["g_params"]
    if args.g_init:
        g_state0, _ = load_state(args.g_init)
        g0 = jax.device_get(g_state0.g_params)

    am_ck = args.am_checkpoint or os.path.join(wd, "ck_am_offline_ft")
    am_state, _ = load_state(am_ck)
    am_ft = jax.device_get(am_state.am_params)

    fwd_enh = make_eval_forward(cfg, use_enhancer=True)

    def wer(mani, am_p, g_p):
        return evaluate_wer(cfg, am_p, mani, g_params=g_p,
                            batch_size=args.batch_size, forward=fwd_enh)["wer"]

    t0 = time.time()
    result = {"steps": args.steps, "am_checkpoint": am_ck,
              "lr_scale": args.lr_scale, "g_init": args.g_init}
    result["wer_test_before"] = wer(meta["test_noisy"], am_ft, g0)
    result["wer_dev_before"] = wer(meta["dev_noisy"], am_ft, g0)

    # Coordinate step: G under frozen co-adapted-AM CTC (reference config 4).
    ft_cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, objective="acoustic", lr_g=cfg.train.lr_g * args.lr_scale,
        batch_size=args.batch_size, epochs=100000, spec_augment=False,
        streaming_finetune=False, streaming_finetune_am=False,
        am_through_enhancer=False))
    ft_cfg = ft_cfg.replace(data=dataclasses.replace(ft_cfg.data,
                                                     val_manifest=""))
    state = init_state(ft_cfg, jax.random.key(23), am_params=am_ft)
    state = state.replace(g_params=g0)
    state2, recs = train(ft_cfg, meta["train_noisy"], max_steps=args.steps,
                         state=state)
    ctc = [r["loss_ctc"] for r in recs if "loss_ctc" in r]
    if ctc:
        result["ft_loss_first"], result["ft_loss_last"] = ctc[0], ctc[-1]

    g2 = jax.device_get(state2.g_params)
    result["wer_test_after"] = wer(meta["test_noisy"], am_ft, g2)
    result["wer_dev_after"] = wer(meta["dev_noisy"], am_ft, g2)
    # Cross-pairing anchor: the alternated G under the ORIGINAL AM tells us
    # whether G' encodes pair-specific structure or a generic improvement.
    result["wer_test_gprime_base_am"] = wer(meta["test_noisy"], am_base, g2)
    result["improvement"] = result["wer_test_before"] - result["wer_test_after"]

    if args.save_checkpoint != "-":
        from aas_enhancement_tpu.utils import checkpoint as ckpt
        ck_dir = args.save_checkpoint or os.path.join(wd, "ck_g_coadapt")
        os.makedirs(ck_dir, exist_ok=True)
        with open(os.path.join(ck_dir, "config.json"), "w") as f:
            f.write(ft_cfg.to_json())
        mgr = ckpt.make_manager(ck_dir)
        ckpt.save(mgr, int(state2.step), jax.device_get(state2))
        mgr.close()
        result["checkpoint_dir"] = ck_dir

    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)
    out = args.out or os.path.join(wd, "coadapt_alternate.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
