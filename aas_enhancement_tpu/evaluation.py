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
                 lm_beta: float = 0.0, word_lm=None, word_alpha: float = 0.0,
                 word_beta: float = 0.0, forward=None,
                 per_utt: bool = False) -> dict:
    """WER over a manifest (greedy or native beam decode); enhances first if
    g_params given.  `manifest` may be a path or a prebuilt AudioDataset;
    `forward` may be a prebuilt make_eval_forward result (reused across calls).
    `per_utt` adds a per-utterance word-error-count list (stable bucketed
    iteration order — two calls with the same manifest/batch settings align
    row-for-row) for paired decoder comparisons on identical utterances."""
    if decoder == "device" and word_lm is not None:
        raise ValueError("decoder='device' supports char-LM fusion only; "
                         "use decoder='beam' for word/hybrid")
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
                                    lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
                                    word_lm=word_lm, word_alpha=word_alpha,
                                    word_beta=word_beta)[:k])
        elif decoder == "device":
            # On-accelerator batched beam (decode/device_beam.py): no-LM or
            # char-LM fusion; word/hybrid fusion stays host-side ("beam").
            from aas_enhancement_tpu.decode.device_beam import (
                device_beam_decode)
            table = order = None
            if lm is not None:
                if hasattr(lm, "dense_table"):
                    table, order = lm.dense_table(), lm.order
                elif isinstance(lm, np.ndarray):
                    raise ValueError("decoder='device' needs a CharNGramLM "
                                     "(table order unknown from a bare array)")
                else:
                    raise ValueError("decoder='device' supports char-LM "
                                     "fusion only; use decoder='beam'")
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            lens = np.sum(np.asarray(pads) < 0.5, axis=1).astype(np.int32)
            hyps.extend(device_beam_decode(
                log_probs, lens, beam_width=beam_width, lm_table=table,
                lm_order=order or 0, lm_alpha=lm_alpha, lm_beta=lm_beta)[:k])
        else:
            hyps.extend(decode_batch(logits, pads)[:k])
        for row, pad_row in zip(batch.labels[:k], batch.label_paddings[:k]):
            n = int(np.sum(pad_row < 0.5))
            refs.append(decode_ids(row[:n]))

    w = corpus_wer(refs, hyps)
    c = float(np.mean([cer(r, h) for r, h in zip(refs, hyps)])) if refs else 0.0
    # Utterance-bootstrap 95% CI: the synthetic held-out splits are small
    # (48 utts), so every headline WER ships its sampling error.
    from aas_enhancement_tpu.decode.wer import corpus_wer_ci
    _, lo, hi = corpus_wer_ci(refs, hyps)
    out = {"wer": w, "wer_ci95": [lo, hi], "cer": c, "utterances": len(refs),
           "sample_ref": refs[0] if refs else "", "sample_hyp": hyps[0] if hyps else ""}
    if per_utt:
        from aas_enhancement_tpu.decode.wer import edit_distance
        out["per_utt"] = [edit_distance(r.split(), h.split())
                          for r, h in zip(refs, hyps)]
    return out


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


def _third_octave_bands(fs: int, nfft: int, n_bands: int, f_min: float):
    """[n_bands, nfft//2+1] one-zero matrix grouping FFT bins into 1/3-octave
    bands with center frequencies f_min * 2^(k/3)."""
    f = np.linspace(0.0, fs / 2.0, nfft // 2 + 1)
    k = np.arange(n_bands)
    f_lo = f_min * 2.0 ** ((k - 0.5) / 3.0)
    f_hi = f_min * 2.0 ** ((k + 0.5) / 3.0)
    bands = np.zeros((n_bands, len(f)))
    for i in range(n_bands):
        lo = int(np.argmin((f - f_lo[i]) ** 2))
        hi = int(np.argmin((f - f_hi[i]) ** 2))
        bands[i, lo:hi] = 1.0
    return bands


def stoi(est: np.ndarray, ref: np.ndarray, fs: int = 16000) -> float:
    """Short-Time Objective Intelligibility (Taal et al. 2010), in [~0, 1].

    Standard speech-enhancement intelligibility metric, reported alongside
    SI-SNR and WER: correlation of short-time (384 ms) 1/3-octave-band
    envelopes of the degraded/enhanced signal vs the clean reference at
    10 kHz, after energy-based silent-frame removal and SDR clipping at
    -15 dB.  Pure numpy/scipy host-side metric (like `si_snr`).
    """
    from scipy.signal import resample_poly

    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    fs_stoi, win, hop, nfft, n_bands, f_min, seg_n, beta = (
        10000, 256, 128, 512, 15, 150.0, 30, -15.0)
    if fs != fs_stoi:
        g = np.gcd(int(fs), fs_stoi)
        est = resample_poly(est, fs_stoi // g, fs // g)
        ref = resample_poly(ref, fs_stoi // g, fs // g)

    def frames(x):
        m = 1 + max(0, (len(x) - win) // hop)
        idx = np.arange(win)[None, :] + hop * np.arange(m)[:, None]
        return x[idx] * np.hanning(win)[None, :]

    xf, yf = frames(ref), frames(est)
    if len(xf) < seg_n:
        raise ValueError(f"stoi needs >= {seg_n * hop + win} samples at "
                         f"{fs_stoi} Hz after resampling, got {len(ref)}")
    # Silent-frame removal: keep frames within 40 dB of the loudest CLEAN
    # frame; the same mask applies to both signals (paper sec. II-A).
    e = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    keep = e > (e.max() - 40.0)
    xf, yf = xf[keep], yf[keep]
    if len(xf) < seg_n:
        raise ValueError("stoi: fewer than one 384 ms segment of active "
                         "speech after silent-frame removal")

    bands = _third_octave_bands(fs_stoi, nfft, n_bands, f_min)
    xb = np.sqrt(bands @ (np.abs(np.fft.rfft(xf, nfft, axis=1)) ** 2).T)
    yb = np.sqrt(bands @ (np.abs(np.fft.rfft(yf, nfft, axis=1)) ** 2).T)

    # Short-time segments of seg_n frames; per band-row: scale the degraded
    # envelope to the clean energy, clip at -beta dB SDR, correlate.
    corrs = []
    for m in range(seg_n, xb.shape[1] + 1):
        x_seg = xb[:, m - seg_n:m]
        y_seg = yb[:, m - seg_n:m]
        scale = (np.linalg.norm(x_seg, axis=1, keepdims=True)
                 / (np.linalg.norm(y_seg, axis=1, keepdims=True) + 1e-12))
        y_prime = np.minimum(y_seg * scale,
                             x_seg * (1.0 + 10.0 ** (-beta / 20.0)))
        x_c = x_seg - x_seg.mean(axis=1, keepdims=True)
        y_c = y_prime - y_prime.mean(axis=1, keepdims=True)
        denom = (np.linalg.norm(x_c, axis=1) * np.linalg.norm(y_c, axis=1)
                 + 1e-12)
        corrs.append(np.sum(x_c * y_c, axis=1) / denom)
    return float(np.mean(corrs))


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
    sto = {"noisy": [], "enhanced": [], "streamed": []}

    def add(kind, wav, clean_wav):
        src[kind].append(si_snr(wav, clean_wav))
        try:
            sto[kind].append(stoi(wav, clean_wav, fs=sr))
        except ValueError:
            pass  # too little active speech for one 384 ms STOI segment

    for i, ((npath, _), (cpath, _)) in enumerate(zip(noisy, clean)):
        nw, _ = read_wav(npath)
        cw, _ = read_wav(cpath)
        add("noisy", nw, cw)
        if enh_fn is not None:
            # Pad to whole-second buckets so the fused program compiles once
            # per bucket, not once per distinct utterance length.
            bucket = max(sr, ((len(nw) + sr - 1) // sr) * sr)
            padded = np.zeros(bucket, np.float32)
            padded[: len(nw)] = nw
            ew = np.asarray(enh_fn(
                g_params, jnp.asarray(padded)[None],
                jnp.asarray([len(nw)], jnp.int32))[0])[: len(nw)]
            add("enhanced", ew, cw)
        if streamed is not None:
            sw, _ = read_wav(streamed[i][0])
            add("streamed", sw, cw)

    out = {f"si_snr_{k}": float(np.mean(v)) for k, v in src.items() if v}
    out.update({f"stoi_{k}": float(np.mean(v)) for k, v in sto.items() if v})
    if "si_snr_enhanced" in out:
        out["si_snr_improvement"] = out["si_snr_enhanced"] - out["si_snr_noisy"]
    return out
