"""Augmentation (SURVEY.md §2 "Augmentation" parity, numpy instead of SoX)."""

import numpy as np

from aas_enhancement_tpu.data.augment import (NoiseInjector, augment_wav,
                                              gain_perturb, speed_perturb)
from aas_enhancement_tpu.data.wav import write_wav


def test_gain_perturb_bounded():
    rng = np.random.default_rng(0)
    x = np.sin(np.linspace(0, 50, 8000)).astype(np.float32) * 0.5
    y = gain_perturb(x, rng)
    assert y.shape == x.shape
    assert float(np.max(np.abs(y))) <= 1.0


def test_speed_perturb_changes_length():
    rng = np.random.default_rng(1)
    x = np.random.default_rng(2).standard_normal(16000).astype(np.float32)
    lengths = {len(speed_perturb(x, rng)) for _ in range(10)}
    assert len(lengths) > 1                       # rates actually vary
    assert all(abs(n - 16000) < 16000 * 0.15 for n in lengths)


def test_noise_injection_snr(tmp_path):
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(32000).astype(np.float32) * 0.3
    write_wav(str(tmp_path / "n0.wav"), noise, 16000)
    inj = NoiseInjector(str(tmp_path), 16000)
    clean = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    noisy = inj(clean, rng, snr_range=(5.0, 5.0))
    resid = noisy - clean
    snr = 10 * np.log10(np.mean(clean ** 2) / (np.mean(resid ** 2) + 1e-12))
    assert abs(snr - 5.0) < 1.0


def test_augment_pipeline(tmp_path):
    rng = np.random.default_rng(4)
    write_wav(str(tmp_path / "n.wav"),
              rng.standard_normal(16000).astype(np.float32) * 0.2, 16000)
    inj = NoiseInjector(str(tmp_path), 16000)
    x = rng.standard_normal(16000).astype(np.float32) * 0.2
    y = augment_wav(x, rng, noise=inj, noise_prob=1.0)
    assert np.all(np.isfinite(y))
    assert float(np.max(np.abs(y))) <= 1.0


def test_augment_speed_gain_knobs(tmp_path):
    """DataConfig.augment_speed/_gain gate the individual perturbations:
    with both off (and no noise_dir) the augmented item is bit-identical to
    the raw decode."""
    import dataclasses

    from aas_enhancement_tpu.config import AudioConfig, DataConfig
    from aas_enhancement_tpu.data.dataset import AudioDataset
    from aas_enhancement_tpu.data.synthetic import generate_corpus

    m = generate_corpus(str(tmp_path), n_utts=2, seed=3, vocab_chars=4)
    base = DataConfig(num_buckets=1)
    ds_raw = AudioDataset(m["clean"], AudioConfig(), base)
    ds_off = AudioDataset(m["clean"], AudioConfig(),
                          dataclasses.replace(base, augment=True,
                                              augment_speed=False,
                                              augment_gain=False))
    ds_gain = AudioDataset(m["clean"], AudioConfig(),
                           dataclasses.replace(base, augment=True,
                                               augment_speed=False))
    raw = next(iter(ds_raw.batches(2, seed=0, epoch=0)))
    off = next(iter(ds_off.batches(2, seed=0, epoch=0)))
    gain = next(iter(ds_gain.batches(2, seed=0, epoch=0)))
    np.testing.assert_array_equal(raw.wav, off.wav)
    np.testing.assert_array_equal(raw.wav_lengths, gain.wav_lengths)  # no speed
    assert not np.array_equal(raw.wav, gain.wav)                      # gain on
