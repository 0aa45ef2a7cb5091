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
