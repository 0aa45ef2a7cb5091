"""End-to-end AAS workflow demonstration (the reference's full pipeline).

Runs on the attached TPU:
  1. generate a synthetic corpus (clean + noisy at 0-10 dB SNR)
  2. pre-train the CTC acoustic model on clean speech
  3. measure greedy WER on clean and on noisy input
  4. train the enhancer with the full AAS objective (frozen AM + discriminator)
  5. measure WER on enhanced input -> the north-star WER delta (BASELINE.json:2)

Writes a JSON summary to --out (default /tmp/aas_e2e/result.json).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aas_e2e")
    p.add_argument("--n-utts", type=int, default=96)
    p.add_argument("--am-steps", type=int, default=400)
    p.add_argument("--aas-steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--vocab-chars", type=int, default=8)
    p.add_argument("--lambda-adv", type=float, default=0.2)
    p.add_argument("--snr-low", type=float, default=0.0)
    p.add_argument("--snr-high", type=float, default=10.0)
    p.add_argument("--out", default="")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import jax
    from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                            DiscriminatorConfig, EnhancerConfig,
                                            TrainConfig)
    from aas_enhancement_tpu.data.synthetic import generate_corpus
    from aas_enhancement_tpu.train.loop import init_state, train
    from aas_enhancement_tpu.cli.evaluate import evaluate_wer

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    manifests = generate_corpus(os.path.join(wd, "corpus"), n_utts=args.n_utts,
                                seed=7, snr_range=(args.snr_low, args.snr_high),
                                vocab_chars=args.vocab_chars)

    def cfg_for(objective):
        return Config(
            am=AMConfig(rnn_hidden=256, rnn_layers=3, conv_channels=16),
            enhancer=EnhancerConfig(conv_channels=16, conv_layers=2,
                                    rnn_hidden=128, rnn_layers=2),
            discriminator=DiscriminatorConfig(channels=(16, 32, 64)),
            train=TrainConfig(objective=objective, batch_size=args.batch_size,
                              epochs=100000, log_every=25, lr_am=6e-4,
                              lr_g=3e-4, lr_d=3e-4, lambda_adv=args.lambda_adv),
            data=DataConfig(num_buckets=2),
        )

    result = {"n_utts": args.n_utts, "am_steps": args.am_steps,
              "aas_steps": args.aas_steps}
    t0 = time.time()

    # --- 1. AM pre-training on clean speech (SURVEY.md §3.1)
    cfg_am = cfg_for("am")
    am_state, recs = train(cfg_am, manifests["clean"], max_steps=args.am_steps)
    result["am_ctc_first"] = recs[0]["loss_ctc_am"]
    result["am_ctc_last"] = recs[-1]["loss_ctc_am"]
    am_params = am_state.am_params

    # --- 2. WER on clean and noisy input
    clean_wer = evaluate_wer(cfg_am, am_params, manifests["clean"],
                             batch_size=args.batch_size)
    noisy_wer = evaluate_wer(cfg_am, am_params, manifests["noisy"],
                             batch_size=args.batch_size)
    result["wer_clean"] = clean_wer["wer"]
    result["wer_noisy"] = noisy_wer["wer"]
    result["sample"] = {"ref": noisy_wer["sample_ref"], "hyp_noisy": noisy_wer["sample_hyp"]}

    # --- 3. Full AAS training (config 5): frozen AM + D, joint objective
    cfg_aas = cfg_for("aas")
    aas_state = init_state(cfg_aas, jax.random.key(1), am_params=am_params)
    aas_state, recs = train(cfg_aas, manifests["noisy"], manifests["clean"],
                            max_steps=args.aas_steps, state=aas_state)
    result["aas_ctc_first"] = recs[0]["loss_ctc"]
    result["aas_ctc_last"] = recs[-1]["loss_ctc"]

    # --- 4. WER on enhanced input -> delta
    enh_wer = evaluate_wer(cfg_aas, am_params, manifests["noisy"],
                           g_params=aas_state.g_params,
                           batch_size=args.batch_size)
    result["wer_enhanced"] = enh_wer["wer"]
    result["wer_delta"] = enh_wer["wer"] - noisy_wer["wer"]
    result["sample"]["hyp_enhanced"] = enh_wer["sample_hyp"]
    result["wall_minutes"] = round((time.time() - t0) / 60.0, 1)

    out = args.out or os.path.join(wd, "result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
