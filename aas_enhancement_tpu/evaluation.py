"""WER evaluation harness: AM greedy/beam decode over a manifest.

Reference capability (SURVEY.md §2 "Evaluate entry point", §3.4): run the acoustic
model over a test manifest, compute corpus WER/CER; optionally enhance first and
report the delta — the north-star quality metric (BASELINE.json:2).  Shared by the
evaluate CLI and by in-training validation (SURVEY.md §3.1 "eval epoch: greedy
decode -> WER", §3.2 "periodic: enhance dev set -> AM decode -> WER").

The jitted forward takes parameters as ARGUMENTS (not closure constants), so one
compiled executable serves every validation call during training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.data.dataset import AudioDataset
from aas_enhancement_tpu.decode.greedy import decode_batch
from aas_enhancement_tpu.decode.wer import cer, corpus_wer
from aas_enhancement_tpu.labels import decode_ids
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.ops.masking import masked_normalize, time_mask
from aas_enhancement_tpu.train.objectives import device_features, enhancer_forward


def make_eval_forward(cfg: Config, use_enhancer: bool):
    """-> jitted (am_params, g_params, wav, wav_lengths) -> (logits, logit_pads)."""
    am = AcousticModel(cfg.am)

    @jax.jit
    def forward(am_params, g_params, wav, wav_lengths):
        if use_enhancer:
            _, log_mag, fl = enhancer_forward(cfg, g_params, wav, wav_lengths)
        else:
            _, log_mag, fl = device_features(cfg, wav, wav_lengths)
        am_in = masked_normalize(log_mag, fl)
        logits, out_lengths = am.apply(am_params, am_in, fl)
        pads = 1.0 - time_mask(out_lengths, logits.shape[1])
        return logits, pads

    return forward


def eval_dataset(cfg: Config, manifest: str) -> AudioDataset:
    """Evaluation must score the WHOLE set, unperturbed: no duration filtering,
    no augmentation, whatever the training data config said."""
    eval_data = dataclasses.replace(cfg.data, augment=False,
                                    min_duration=0.0, max_duration=1e9)
    return AudioDataset(manifest, cfg.audio, eval_data)


def evaluate_wer(cfg: Config, am_params, manifest, g_params=None,
                 batch_size: int = 4, decoder: str = "greedy",
                 beam_width: int = 32, lm=None, lm_alpha: float = 0.0,
                 lm_beta: float = 0.0, forward=None) -> dict:
    """WER over a manifest (greedy or native beam decode); enhances first if
    g_params given.  `manifest` may be a path or a prebuilt AudioDataset;
    `forward` may be a prebuilt make_eval_forward result (reused across calls)."""
    ds = manifest if isinstance(manifest, AudioDataset) else eval_dataset(cfg, manifest)
    if forward is None:
        forward = make_eval_forward(cfg, use_enhancer=g_params is not None)

    refs, hyps = [], []
    for batch in ds.batches(batch_size, seed=0, epoch=0):
        logits, pads = forward(am_params, g_params if g_params is not None else {},
                               jnp.asarray(batch.wav),
                               jnp.asarray(batch.wav_lengths))
        k = batch.size  # drop repeat-padded rows from metrics
        if decoder == "beam":
            from aas_enhancement_tpu.decode.beam import beam_decode
            log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
            lens = np.sum(np.asarray(pads) < 0.5, axis=1).astype(np.int32)
            hyps.extend(beam_decode(log_probs, lens, beam_width=beam_width,
                                    lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta)[:k])
        else:
            hyps.extend(decode_batch(logits, pads)[:k])
        for row, pad_row in zip(batch.labels[:k], batch.label_paddings[:k]):
            n = int(np.sum(pad_row < 0.5))
            refs.append(decode_ids(row[:n]))

    w = corpus_wer(refs, hyps)
    c = float(np.mean([cer(r, h) for r, h in zip(refs, hyps)])) if refs else 0.0
    return {"wer": w, "cer": c, "utterances": len(refs),
            "sample_ref": refs[0] if refs else "", "sample_hyp": hyps[0] if hyps else ""}


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR (dB) of one estimated waveform vs its reference.

    Standard enhancement-quality metric (zero-mean, project est onto ref,
    10*log10 of signal power over residual power).  Complements WER — the
    north star is recognition quality, SI-SNR measures signal fidelity.
    """
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    n = min(len(est), len(ref))
    est, ref = est[:n] - est[:n].mean(), ref[:n] - ref[:n].mean()
    denom = np.dot(ref, ref) + 1e-12
    s_t = (np.dot(est, ref) / denom) * ref
    e = est - s_t
    return float(10.0 * np.log10((np.dot(s_t, s_t) + 1e-12)
                                 / (np.dot(e, e) + 1e-12)))


def evaluate_si_snr(cfg: Config, noisy_manifest: str, clean_manifest: str,
                    g_params=None, streamed_manifest: str | None = None) -> dict:
    """Mean SI-SNR of noisy (and optionally enhanced / pre-enhanced) wavs vs
    their paired clean references.  `g_params` enhances on the fly via the
    fused inference path; `streamed_manifest` scores pre-written wavs (e.g.
    the streaming pipeline's output)."""
    from aas_enhancement_tpu.data.manifest import read_manifest
    from aas_enhancement_tpu.data.wav import read_wav

    noisy = read_manifest(noisy_manifest)
    clean = read_manifest(clean_manifest)
    if len(noisy) != len(clean):
        raise ValueError("SI-SNR needs paired manifests of equal length")
    streamed = read_manifest(streamed_manifest) if streamed_manifest else None
    if streamed is not None and len(streamed) != len(noisy):
        raise ValueError(
            f"streamed manifest has {len(streamed)} rows, expected "
            f"{len(noisy)} — zip would silently truncate all metrics")
    enh_fn = None
    if g_params is not None:
        from aas_enhancement_tpu.enhance import make_enhance_fn
        enh_fn = make_enhance_fn(cfg)

    sr = cfg.audio.sample_rate
    src = {"noisy": [], "enhanced": [], "streamed": []}
    for i, ((npath, _), (cpath, _)) in enumerate(zip(noisy, clean)):
        nw, _ = read_wav(npath)
        cw, _ = read_wav(cpath)
        src["noisy"].append(si_snr(nw, cw))
        if enh_fn is not None:
            # Pad to whole-second buckets so the fused program compiles once
            # per bucket, not once per distinct utterance length.
            bucket = max(sr, ((len(nw) + sr - 1) // sr) * sr)
            padded = np.zeros(bucket, np.float32)
            padded[: len(nw)] = nw
            ew = np.asarray(enh_fn(
                g_params, jnp.asarray(padded)[None],
                jnp.asarray([len(nw)], jnp.int32))[0])[: len(nw)]
            src["enhanced"].append(si_snr(ew, cw))
        if streamed is not None:
            sw, _ = read_wav(streamed[i][0])
            src["streamed"].append(si_snr(sw, cw))

    out = {f"si_snr_{k}": float(np.mean(v)) for k, v in src.items() if v}
    if "si_snr_enhanced" in out:
        out["si_snr_improvement"] = out["si_snr_enhanced"] - out["si_snr_noisy"]
    return out
