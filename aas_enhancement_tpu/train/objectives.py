"""Loss functions for the four training objectives + AM pre-training.

Reference capability (SURVEY.md §2 "Losses", §3.2; BASELINE.json:8-11):
- paired L1/MSE spectrogram mapping (supervised baseline, config 2)
- adversarial LSGAN/BCE on the spectrogram discriminator (config 3)
- acoustic supervision: CTC of the frozen AM on enhanced features (config 4)
- joint AAS: L_G = L_acoustic + lambda * L_adv (config 5)

All device-side, fully jittable, padding-masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.dsp import api as dsp_api
from aas_enhancement_tpu.dsp.stft import magnitude
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.discriminator import Discriminator
from aas_enhancement_tpu.models.enhancer import Enhancer, apply_enhancement
from aas_enhancement_tpu.ops.ctc import ctc_loss_mean
from aas_enhancement_tpu.ops.masking import masked_normalize, time_mask


def wav_f32(wav: jnp.ndarray) -> jnp.ndarray:
    """int16 transport (DataConfig.feed_dtype) -> f32 [-1, 1); f32 passthrough."""
    if jnp.issubdtype(wav.dtype, jnp.integer):
        return wav.astype(jnp.float32) * (1.0 / 32768.0)
    return wav


def device_features(cfg: Config, wav: jnp.ndarray, wav_lengths: jnp.ndarray):
    """On-device featurization: padded wav [B, N] -> (mag, log_mag, frame_lengths).

    The host ships waveforms; STFT runs inside the jitted step (BASELINE.json:5).
    int16 feeds (DataConfig.feed_dtype, half the host->device bytes) convert to
    f32 here, on device.
    """
    a = cfg.audio
    wav = wav_f32(wav)
    re, im = dsp_api.stft(a, wav)
    mag = magnitude(re, im)
    log_mag = jnp.log1p(mag)
    if a.center:
        frame_lengths = 1 + wav_lengths // a.hop_length
    else:
        frame_lengths = 1 + (wav_lengths - a.n_fft) // a.hop_length
    return mag, log_mag, frame_lengths.astype(jnp.int32)


def enhancer_forward(cfg: Config, g_params, wav, wav_lengths,
                     streaming: bool = False):
    """noisy wav -> (enhanced_mag, enhanced_log_mag, frame_lengths).

    streaming=True runs the block-bidirectional streaming forward
    (models/enhancer.blockwise_apply) instead of the full-utterance BLSTM —
    set from TrainConfig.streaming_finetune by the training objectives so
    deployed chunked inference matches what G was trained for."""
    mag, log_mag, fl = device_features(cfg, wav, wav_lengths)
    net_in = masked_normalize(log_mag, fl) if cfg.audio.normalize else log_mag
    if streaming:
        from aas_enhancement_tpu.models.enhancer import blockwise_apply
        fps = cfg.audio.sample_rate / cfg.audio.hop_length  # frames per second
        out = blockwise_apply(
            cfg.enhancer, g_params, net_in, fl,
            chunk_f=max(1, int(cfg.train.stream_chunk_s * fps)),
            look_f=int(cfg.train.stream_lookahead_s * fps),
            hist_f=int(cfg.train.stream_history_s * fps))
    else:
        out = Enhancer(cfg.enhancer).apply(g_params, net_in, fl)
    enh_mag = apply_enhancement(cfg.enhancer, out, mag)
    return enh_mag, jnp.log1p(enh_mag), fl


def _wmean(x: jnp.ndarray, weights, denom=None) -> jnp.ndarray:
    """Weighted mean over the batch dim (weights None -> plain mean).

    denom: optional externally-fixed denominator replacing sum(weights).  Used
    by gradient accumulation (train/steps.py): each microbatch divides by its
    SHARE of the global real-row count (W_total / k), so summing the k
    microbatch values reproduces the full-batch weighted mean exactly even
    when microbatches carry different numbers of real rows.
    """
    if weights is None and denom is None:
        return jnp.mean(x)
    if weights is None:
        w = jnp.ones((x.shape[0],), x.dtype)
    else:
        w = weights.astype(x.dtype)
    d = jnp.sum(w) if denom is None else jnp.asarray(denom, x.dtype)
    return jnp.sum(x * w) / jnp.maximum(d, 1e-6)


def _row_weights(batch, key: str = "row_weights"):
    return batch.get(key)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, lengths: jnp.ndarray,
              weights=None, denom=None) -> jnp.ndarray:
    mask = time_mask(lengths, pred.shape[1], pred.dtype)[:, :, None]
    per_ex = (jnp.sum(jnp.abs(pred - target) * mask, axis=(1, 2))
              / jnp.maximum(jnp.sum(mask, axis=(1, 2)) * pred.shape[2], 1.0))
    return _wmean(per_ex, weights, denom)


def mr_stft_loss(est_wav: jnp.ndarray, ref_wav: jnp.ndarray,
                 wav_lengths: jnp.ndarray, weights=None, denom=None,
                 resolutions: tuple = ((256, 64), (512, 128), (1024, 256))
                 ) -> jnp.ndarray:
    """Multi-resolution STFT loss (Parallel WaveGAN, arXiv:1910.11480 —
    PAPERS.md): mean over resolutions of spectral convergence + log-magnitude
    L1 between waveforms, masked to valid frames (padding-invariant, like
    every other loss here).  Beyond-reference quality term for the paired
    objective (TrainConfig.lambda_mrstft).  Both waveforms must be in f32
    [-1, 1) scale (wav_f32 the int16 transport first)."""
    from aas_enhancement_tpu.dsp.stft import stft as stft_raw

    eps = 1e-7
    total = jnp.zeros((), jnp.float32)
    for n_fft, hop in resolutions:
        re_e, im_e = stft_raw(est_wav.astype(jnp.float32), n_fft, hop,
                              "hann", True)
        re_r, im_r = stft_raw(ref_wav.astype(jnp.float32), n_fft, hop,
                              "hann", True)
        mag_e = magnitude(re_e, im_e)
        mag_r = magnitude(re_r, im_r)
        fl = (1 + wav_lengths // hop).astype(jnp.int32)
        fm = time_mask(fl, mag_e.shape[1], jnp.float32)[:, :, None]  # [B,T,1]
        nvalid = jnp.maximum(jnp.sum(fm, axis=(1, 2)) * mag_e.shape[2], 1.0)
        diff = jnp.sqrt(jnp.sum(((mag_r - mag_e) * fm) ** 2, axis=(1, 2)) + eps)
        ref_n = jnp.sqrt(jnp.sum((mag_r * fm) ** 2, axis=(1, 2)) + eps)
        sc = diff / ref_n                                       # [B]
        logl1 = (jnp.sum(jnp.abs(jnp.log(mag_r + eps) - jnp.log(mag_e + eps))
                         * fm, axis=(1, 2)) / nvalid)           # [B]
        total = total + _wmean(sc + logl1, weights, denom)
    return total / len(resolutions)


def paired_loss(cfg: Config, g_params, batch,
                w_denom=None) -> tuple[jnp.ndarray, dict]:
    """Config 2: L1 between enhanced and clean log-magnitudes (BASELINE.json:8),
    optionally + lambda_mrstft * multi-resolution STFT loss on the
    reconstructed waveform (noisy phase, the actual inference output)."""
    from aas_enhancement_tpu.dsp.stft import phase

    enh_mag, enh_log, fl = enhancer_forward(cfg, g_params, batch["wav"],
                                            batch["wav_lengths"],
                                            streaming=cfg.train.streaming_finetune)
    _, clean_log, _ = device_features(cfg, batch["clean_wav"], batch["wav_lengths"])
    rw = _row_weights(batch)
    loss = masked_l1(enh_log, clean_log, fl, rw, w_denom)
    aux = {"loss_paired": loss}
    if cfg.train.lambda_mrstft > 0.0:
        # Same conversion chain as enhancer_forward's internal STFT so XLA
        # CSEs the two (one STFT pays for both the features and the phase).
        noisy_f = wav_f32(batch["wav"])
        re, im = dsp_api.stft(cfg.audio, noisy_f)
        ph = phase(re, im)
        enh_wav = dsp_api.reconstruct(cfg.audio, enh_mag, ph,
                                      length=noisy_f.shape[1])
        l_mr = mr_stft_loss(enh_wav, wav_f32(batch["clean_wav"]),
                            batch["wav_lengths"], weights=rw, denom=w_denom)
        loss = loss + cfg.train.lambda_mrstft * l_mr
        aux["loss_mrstft"] = l_mr
        aux["loss_paired_total"] = loss
    return loss, aux


def gan_g_loss(cfg: Config, scores_fake: jnp.ndarray, weights=None,
               denom=None) -> jnp.ndarray:
    if cfg.train.gan_loss == "lsgan":
        return _wmean((scores_fake - 1.0) ** 2, weights, denom)
    # BCE: -log sigmoid(fake)
    return _wmean(jax.nn.softplus(-scores_fake), weights, denom)


def gan_d_loss(cfg: Config, scores_real: jnp.ndarray, scores_fake: jnp.ndarray,
               w_real=None, w_fake=None, real_denom=None,
               fake_denom=None) -> jnp.ndarray:
    if cfg.train.gan_loss == "lsgan":
        return 0.5 * (_wmean((scores_real - 1.0) ** 2, w_real, real_denom)
                      + _wmean(scores_fake ** 2, w_fake, fake_denom))
    return (_wmean(jax.nn.softplus(-scores_real), w_real, real_denom)
            + _wmean(jax.nn.softplus(scores_fake), w_fake, fake_denom))


def generator_loss(cfg: Config, g_params, d_params, am_params, batch,
                   use_acoustic: bool, use_adv: bool,
                   lam: float, w_denom=None) -> tuple[jnp.ndarray, dict]:
    """Unified G objective: the enhancer forward runs ONCE; the CTC and adversarial
    terms are computed on its output as requested (SURVEY.md §3.2 — the reference
    likewise reuses a single G forward per iteration for both losses and for the
    detached D fake batch).

    Returns aux containing `enh_log`/`enh_fl` (stop-gradient) so the D update can
    reuse the same enhanced batch without a second G forward.
    """
    _, enh_log, fl = enhancer_forward(cfg, g_params, batch["wav"],
                                      batch["wav_lengths"],
                                      streaming=cfg.train.streaming_finetune)
    loss = jnp.zeros((), jnp.float32)
    aux: dict = {}
    rw = _row_weights(batch)

    if use_acoustic:
        am_in = masked_normalize(enh_log, fl)
        frozen = jax.lax.stop_gradient(am_params)
        logits, out_lengths = AcousticModel(cfg.am).apply(frozen, am_in, fl)
        logit_paddings = 1.0 - time_mask(out_lengths, logits.shape[1])
        l_ctc = ctc_loss_mean(logits, logit_paddings, batch["labels"],
                              batch["label_paddings"], weights=rw,
                              denom=w_denom)
        loss = loss + l_ctc
        aux["loss_ctc"] = l_ctc

    if use_adv:
        scores = Discriminator(cfg.discriminator).apply(d_params, enh_log, fl)
        l_adv = gan_g_loss(cfg, scores, rw, w_denom)
        loss = loss + (lam if use_acoustic else 1.0) * l_adv
        aux["loss_adv_g"] = l_adv
        aux["d_score_fake_g"] = _wmean(scores, rw, w_denom)

    aux["loss_g"] = loss
    aux["enh_log"] = jax.lax.stop_gradient(enh_log)
    aux["enh_fl"] = fl
    return loss, aux


def discriminator_loss(cfg: Config, d_params, enh_log, enh_fl,
                       clean_log, clean_fl, w_fake=None, w_real=None,
                       fake_denom=None, real_denom=None
                       ) -> tuple[jnp.ndarray, dict]:
    """D update: real = unpaired clean corpus, fake = stop-grad enhanced."""
    disc = Discriminator(cfg.discriminator)
    s_real = disc.apply(d_params, clean_log, clean_fl)
    s_fake = disc.apply(d_params, jax.lax.stop_gradient(enh_log), enh_fl)
    loss = gan_d_loss(cfg, s_real, s_fake, w_real=w_real, w_fake=w_fake,
                      real_denom=real_denom, fake_denom=fake_denom)
    return loss, {"loss_d": loss,
                  "d_score_real": _wmean(s_real, w_real, real_denom),
                  "d_score_fake": _wmean(s_fake, w_fake, fake_denom)}


def distill_kl(base_logits: jnp.ndarray, logits: jnp.ndarray,
               out_lengths: jnp.ndarray, weights=None,
               denom=None) -> jnp.ndarray:
    """Posterior-anchor distillation: masked mean-per-frame
    KL(softmax(base) || softmax(adapted)), averaged over the batch with the
    same real-row weighting as every other loss.  base_logits are stop-grad
    (the anchor never trains)."""
    base = jax.lax.stop_gradient(base_logits.astype(jnp.float32))
    p = jax.nn.softmax(base, -1)
    kl = jnp.sum(p * (jax.nn.log_softmax(base, -1)
                      - jax.nn.log_softmax(logits.astype(jnp.float32), -1)),
                 axis=-1)                                   # [B, T]
    fm = time_mask(out_lengths, kl.shape[1], kl.dtype)
    per_ex = jnp.sum(kl * fm, axis=1) / jnp.maximum(jnp.sum(fm, axis=1), 1.0)
    return _wmean(per_ex, weights, denom)


def am_pretrain_loss(cfg: Config, am_params, batch,
                     w_denom=None, rng=None,
                     g_params=None,
                     anchor_am_params=None) -> tuple[jnp.ndarray, dict]:
    """AM pre-training on (typically clean) speech (SURVEY.md §3.1).

    `rng` non-None enables SpecAugment (cfg.train.spec_augment) — train-step
    only; the eval forward never passes one.  `g_params` non-None
    (TrainConfig.am_through_enhancer) feeds the AM the FROZEN enhancer's
    output features instead of the raw input — deployment-distribution
    adaptation; the enhancer forward respects cfg.train.streaming_finetune.
    `anchor_am_params` non-None + cfg.train.distill_lambda > 0 adds the
    posterior-anchor KL term (distill_kl): the base AM runs its OFFLINE
    forward on the same features and the adapted AM's frame posteriors are
    pulled toward it (VERDICT r4 #1c)."""
    if g_params is not None:
        frozen_g = jax.lax.stop_gradient(g_params)
        _, log_mag, fl = enhancer_forward(cfg, frozen_g, batch["wav"],
                                          batch["wav_lengths"],
                                          streaming=cfg.train.streaming_finetune)
    else:
        _, log_mag, fl = device_features(cfg, batch["wav"],
                                         batch["wav_lengths"])
    am_in = masked_normalize(log_mag, fl)
    if rng is not None and cfg.train.spec_augment:
        from aas_enhancement_tpu.ops.masking import spec_augment
        t = cfg.train
        am_in = spec_augment(rng, am_in, fl, t.sa_time_masks, t.sa_time_width,
                             t.sa_freq_masks, t.sa_freq_width)
    if cfg.train.streaming_finetune_am:
        # Live-deployment adaptation: the block-streaming AM forward at the
        # serving operating point (mirror of the enhancer streaming_finetune).
        from aas_enhancement_tpu.models.am import am_blockwise_apply
        fps = cfg.audio.sample_rate / cfg.audio.hop_length
        logits, out_lengths = am_blockwise_apply(
            cfg.am, am_params, am_in, fl,
            chunk_f=max(2, int(cfg.train.stream_chunk_s * fps)),
            look_f=int(cfg.train.stream_lookahead_s * fps),
            hist_f=int(cfg.train.stream_history_s * fps))
    else:
        logits, out_lengths = AcousticModel(cfg.am).apply(am_params, am_in, fl)
    logit_paddings = 1.0 - time_mask(out_lengths, logits.shape[1])
    loss = ctc_loss_mean(logits, logit_paddings, batch["labels"],
                         batch["label_paddings"], weights=_row_weights(batch),
                         denom=w_denom)
    aux = {"loss_ctc_am": loss}
    if anchor_am_params is not None and cfg.train.distill_lambda > 0.0:
        anchor = jax.lax.stop_gradient(anchor_am_params)
        base_logits, base_ol = AcousticModel(cfg.am).apply(anchor, am_in, fl)
        # Offline anchor vs (possibly blockwise) adapted forward: the time
        # reduction is identical, so out_lengths agree; mask with the min
        # defensively.
        l_kl = distill_kl(base_logits, logits,
                          jnp.minimum(out_lengths, base_ol),
                          weights=_row_weights(batch), denom=w_denom)
        loss = loss + cfg.train.distill_lambda * l_kl
        aux["loss_distill"] = l_kl
        aux["loss_am_total"] = loss
    return loss, aux
