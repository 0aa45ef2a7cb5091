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

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.data.dataset import AudioDataset
from aas_enhancement_tpu.data.manifest import read_transcript
from aas_enhancement_tpu.decode.greedy import decode_batch
from aas_enhancement_tpu.decode.wer import cer, corpus_wer
from aas_enhancement_tpu.labels import decode_ids
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.ops.masking import masked_normalize, time_mask
from aas_enhancement_tpu.train.objectives import device_features, enhancer_forward


def evaluate_wer(cfg: Config, am_params, manifest: str, g_params=None,
                 batch_size: int = 4, decoder: str = "greedy",
                 beam_width: int = 32) -> dict:
    """WER over a manifest (greedy or native beam decode); enhances first if
    g_params given."""
    import dataclasses
    # Evaluation must score the WHOLE test set, unperturbed: no duration
    # filtering, no augmentation, whatever the training data config said.
    eval_data = dataclasses.replace(cfg.data, augment=False,
                                    min_duration=0.0, max_duration=1e9)
    ds = AudioDataset(manifest, cfg.audio, eval_data)
    am = AcousticModel(cfg.am)

    @jax.jit
    def forward(wav, wav_lengths):
        if g_params is not None:
            _, log_mag, fl = enhancer_forward(cfg, g_params, wav, wav_lengths)
        else:
            _, log_mag, fl = device_features(cfg, wav, wav_lengths)
        am_in = masked_normalize(log_mag, fl)
        logits, out_lengths = am.apply(am_params, am_in, fl)
        pads = 1.0 - time_mask(out_lengths, logits.shape[1])
        return logits, pads

    refs, hyps = [], []
    for batch in ds.batches(batch_size, seed=0, epoch=0):
        logits, pads = forward(jnp.asarray(batch.wav),
                               jnp.asarray(batch.wav_lengths))
        k = batch.size  # drop repeat-padded rows from metrics
        if decoder == "beam":
            from aas_enhancement_tpu.decode.beam import beam_decode
            log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
            lens = np.sum(np.asarray(pads) < 0.5, axis=1).astype(np.int32)
            hyps.extend(beam_decode(log_probs, lens, beam_width=beam_width)[:k])
        else:
            hyps.extend(decode_batch(logits, pads)[:k])
        for row, pad_row in zip(batch.labels[:k], batch.label_paddings[:k]):
            n = int(np.sum(pad_row < 0.5))
            refs.append(decode_ids(row[:n]))

    w = corpus_wer(refs, hyps)
    c = float(np.mean([cer(r, h) for r, h in zip(refs, hyps)])) if refs else 0.0
    return {"wer": w, "cer": c, "utterances": len(refs),
            "sample_ref": refs[0] if refs else "", "sample_hyp": hyps[0] if hyps else ""}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", required=True)
    p.add_argument("--am-checkpoint", required=True)
    p.add_argument("--enhancer-checkpoint",
                   help="if given, also report WER on enhanced input + delta")
    p.add_argument("--config", help="config JSON")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--beam-width", type=int, default=32)
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

    result = {"noisy": evaluate_wer(cfg, am_params, args.manifest,
                                    batch_size=args.batch_size,
                                    decoder=args.decoder,
                                    beam_width=args.beam_width)}
    if args.enhancer_checkpoint:
        g_state, g_cfg = load_state(args.enhancer_checkpoint)
        g_params = g_state.g_params
        if not g_params:
            raise SystemExit(f"{args.enhancer_checkpoint}: checkpoint has no enhancer")
        cfg = cfg.replace(enhancer=g_cfg.enhancer)
        result["enhanced"] = evaluate_wer(cfg, am_params, args.manifest,
                                          g_params=g_params,
                                          batch_size=args.batch_size,
                                          decoder=args.decoder,
                                          beam_width=args.beam_width)
        result["wer_delta"] = result["enhanced"]["wer"] - result["noisy"]["wer"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
