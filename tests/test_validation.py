"""Round-2 train-loop features: in-training validation (SURVEY.md §3.1/§3.2
"eval epoch" / "periodic dev-set WER"), LR annealing + SortaGrad (SURVEY.md §2
"Train: acoustic model"), and position-deterministic augmentation RNG."""

import dataclasses
import json
import os

import numpy as np
import pytest

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        DiscriminatorConfig, EnhancerConfig,
                                        TrainConfig)
from aas_enhancement_tpu.data.dataset import AudioDataset
from aas_enhancement_tpu.data.synthetic import generate_corpus
from aas_enhancement_tpu.train.loop import train
from aas_enhancement_tpu.train.state import lr_schedule


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return generate_corpus(str(d), n_utts=8, seed=11, vocab_chars=6)


@pytest.fixture(scope="module")
def val_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("val_corpus")
    return generate_corpus(str(d), n_utts=4, seed=77, vocab_chars=6)


def _tiny_cfg(objective, data_kw=None, **train_kw):
    train_kw = {"epochs": 100, "log_every": 1, "lr_g": 2e-3, "lr_d": 2e-3,
                "lr_am": 2e-3, **train_kw}
    return Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=24, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective=objective, batch_size=4, **train_kw),
        data=DataConfig(num_buckets=1, **(data_kw or {})),
    )


# ---------------------------------------------------------------- validation

@pytest.mark.slow
def test_val_wer_logged_and_best_checkpoint(corpus, val_corpus, tmp_path):
    """AM pre-training with a val manifest: val_wer records appear, the final
    step is always validated, and best.json + best_ckpt/ are written."""
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = _tiny_cfg("am", data_kw={"val_manifest": val_corpus["clean"]},
                    eval_every=4, eval_batch_size=4)
    _, recs = train(cfg, corpus["clean"], max_steps=6, checkpoint_dir=ckpt_dir)
    val_recs = [r for r in recs if "val_wer" in r]
    assert val_recs, "no val_wer records logged"
    assert val_recs[0]["step"] == 4
    assert val_recs[-1]["step"] == 6, "final step must be validated"
    assert all(np.isfinite(r["val_wer"]) for r in val_recs)
    best = json.load(open(os.path.join(ckpt_dir, "best.json")))
    assert best["val_wer"] == min(r["val_wer"] for r in val_recs)
    assert os.path.isdir(os.path.join(ckpt_dir, "best_ckpt"))


@pytest.mark.slow
def test_val_wer_enhanced_and_noisy_for_aas(corpus, val_corpus):
    """AAS: validation decodes the ENHANCED dev set through the frozen AM and
    logs the constant noisy baseline alongside (SURVEY.md §3.2)."""
    cfg = _tiny_cfg("aas", data_kw={"val_manifest": val_corpus["noisy"]},
                    eval_every=0)  # epoch-end cadence
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=4)
    val_recs = [r for r in recs if "val_wer" in r]
    assert val_recs, "no val_wer records logged"
    assert all("val_wer_noisy" in r for r in val_recs)
    noisy = {r["val_wer_noisy"] for r in val_recs}
    assert len(noisy) == 1, "frozen-AM noisy baseline must be constant"


@pytest.mark.slow
def test_no_validation_without_manifest(corpus):
    cfg = _tiny_cfg("am")
    _, recs = train(cfg, corpus["clean"], max_steps=3)
    assert not any("val_wer" in r for r in recs)


# ------------------------------------------------------------ LR + SortaGrad

def test_lr_schedule_anneals():
    cfg = _tiny_cfg("am", lr_anneal=2.0, steps_per_epoch=10)
    sched = lr_schedule(cfg, 1e-2)
    assert sched(0) == pytest.approx(1e-2)
    assert sched(9) == pytest.approx(1e-2)
    assert sched(10) == pytest.approx(5e-3)
    assert sched(25) == pytest.approx(2.5e-3)


@pytest.mark.slow
def test_lr_anneal_changes_trajectory(corpus):
    """The schedule must actually reach the optimizer: with a huge anneal the
    post-epoch-1 updates are frozen, so the two runs diverge."""
    base = _tiny_cfg("am", epochs=3)
    s1, _ = train(base, corpus["clean"], max_steps=5)
    ann = _tiny_cfg("am", epochs=3, lr_anneal=1e9)
    s2, _ = train(ann, corpus["clean"], max_steps=5)
    # 8 utts / batch 4 = 2 steps per epoch; steps 3-5 are epoch>=1 (LR ~ 0).
    import jax
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(s1.am_params),
                             jax.tree.leaves(s2.am_params))]
    assert max(diffs) > 0, "annealed run should differ from constant-LR run"


def test_sortagrad_epoch0_sorted(corpus):
    cfg = Config(data=DataConfig(num_buckets=4))
    ds = AudioDataset(corpus["noisy"], cfg.audio, cfg.data)
    lens = []
    for b in ds.batches(2, seed=0, epoch=0, sorted_order=True):
        lens.extend(np.asarray(b.wav_lengths)[: b.size].tolist())
    assert lens == sorted(lens), "sortagrad epoch must be duration-sorted"


def test_epoch1_not_sorted_by_default(corpus):
    cfg = Config(data=DataConfig(num_buckets=4))
    ds = AudioDataset(corpus["noisy"], cfg.audio, cfg.data)
    lens = []
    for b in ds.batches(2, seed=0, epoch=1):
        lens.extend(np.asarray(b.wav_lengths)[: b.size].tolist())
    assert lens != sorted(lens)


# ------------------------------------------------- augment RNG determinism

def test_augment_position_deterministic(corpus):
    """Same (item, epoch) -> same augmented audio, regardless of which batches
    were decoded before (ADVICE r1: resume / grain-worker determinism)."""
    cfg = Config(data=DataConfig(num_buckets=1, augment=True))
    ds1 = AudioDataset(corpus["noisy"], cfg.audio, cfg.data)
    full = list(ds1.batches(2, seed=0, epoch=1))

    # Resume fast-forward: decode batch 1 on a fresh dataset WITHOUT ever
    # decoding batch 0 — the draws must match the uninterrupted run.
    ds2 = AudioDataset(corpus["noisy"], cfg.audio, cfg.data)
    resumed = list(ds2.batches(2, seed=0, epoch=1, start=1))
    assert len(resumed) == len(full) - 1
    for a, b in zip(full[1:], resumed):
        np.testing.assert_array_equal(a.wav, b.wav)

    # Same item in a different epoch must draw a different augmentation.
    item0 = ds2.items[0]
    w1, _, _ = ds2._load(item0, ds2.bucket_of(item0["num_samples"]), epoch=1)
    w2, _, _ = ds2._load(item0, ds2.bucket_of(item0["num_samples"]), epoch=2)
    assert not np.array_equal(w1, w2)
