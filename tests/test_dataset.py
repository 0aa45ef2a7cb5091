"""Data pipeline: bucketing, padding, label widths, clean stream
(SURVEY.md §2 "Manifest data pipeline" parity)."""

import numpy as np
import pytest

from aas_enhancement_tpu.config import AudioConfig, DataConfig
from aas_enhancement_tpu.data.dataset import AudioDataset, UnpairedCleanStream
from aas_enhancement_tpu.data.synthetic import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return generate_corpus(str(tmp_path_factory.mktemp("ds")), n_utts=12, seed=21)


def _ds(corpus, paired=False, **data_kw):
    return AudioDataset(corpus["noisy"], AudioConfig(),
                        DataConfig(**data_kw),
                        paired_manifest=corpus["clean"] if paired else None)


def test_bucket_shapes_bounded(corpus):
    ds = _ds(corpus, num_buckets=3)
    assert 1 <= len(ds.bucket_sizes) <= 3
    shapes = set()
    for batch in ds.batches(4, seed=0, epoch=0):
        shapes.add(batch.wav.shape[1])
        assert batch.wav.shape[0] == 4                 # static batch via repeat-pad
        assert np.all(batch.wav_lengths <= batch.wav.shape[1])
    assert shapes <= set(ds.bucket_sizes)


def test_labels_padded_uniformly(corpus):
    ds = _ds(corpus)
    u = ds.max_label_len
    assert u % 8 == 0
    for batch in ds.batches(4, seed=0, epoch=0):
        assert batch.labels.shape[1] == u
        valid = np.sum(batch.label_paddings < 0.5, axis=1)
        assert np.all(valid > 0)
        # ids under padding are zero (blank) and never counted
        for row, pad in zip(batch.labels, batch.label_paddings):
            assert np.all(row[pad > 0.5] == 0)


def test_paired_batches_aligned(corpus):
    ds = _ds(corpus, paired=True)
    batch = next(iter(ds.batches(4, seed=0, epoch=0)))
    assert batch.clean_wav is not None
    assert batch.clean_wav.shape == batch.wav.shape


def test_epoch_shuffling_changes_order(corpus):
    ds = _ds(corpus, num_buckets=1)
    first = [b.wav_lengths.tolist() for b in ds.batches(4, seed=0, epoch=1)]
    second = [b.wav_lengths.tolist() for b in ds.batches(4, seed=0, epoch=2)]
    assert first != second


def test_clean_stream_matches_bucket(corpus):
    ds = _ds(corpus)
    stream = UnpairedCleanStream(ds, batch_size=4)
    b = stream.next_batch(bucket=48000)
    assert b.wav.shape == (4, 48000)


def test_duration_filtering(corpus):
    ds = _ds(corpus, min_duration=0.0, max_duration=100.0)
    n_all = len(ds)
    ds2 = _ds(corpus, min_duration=1.2, max_duration=100.0)
    assert len(ds2) < n_all                             # short utts dropped


def test_num_batches_matches_iteration(corpus):
    ds = _ds(corpus, num_buckets=3)
    counted = ds.num_batches(4)
    iterated = sum(1 for _ in ds.batches(4, seed=0, epoch=0))
    assert counted == iterated


def test_augment_margin_buckets(corpus):
    """With augmentation on, buckets are sized for the worst-case slowdown."""
    plain = _ds(corpus, num_buckets=1)
    aug = _ds(corpus, num_buckets=1, augment=True)
    assert max(aug.bucket_sizes) >= max(plain.bucket_sizes)


def test_int16_feed_roundtrip(corpus):
    """feed_dtype=int16 ships int16 batches whose device-side f32 conversion
    matches the float32 feed to quantization precision, end to end through the
    jitted featurization (train/objectives.device_features)."""
    import jax.numpy as jnp

    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.train.objectives import device_features

    ds16 = _ds(corpus, feed_dtype="int16")
    ds32 = _ds(corpus)
    b16 = next(ds16.batches(4, seed=0, epoch=0))
    b32 = next(ds32.batches(4, seed=0, epoch=0))
    assert b16.wav.dtype == np.int16
    assert b32.wav.dtype == np.float32
    assert np.max(np.abs(b16.wav.astype(np.float32) / 32768.0 - b32.wav)) < 1 / 32768.0

    cfg = Config()
    _, log16, fl16 = device_features(cfg, jnp.asarray(b16.wav),
                                     jnp.asarray(b16.wav_lengths))
    _, log32, fl32 = device_features(cfg, jnp.asarray(b32.wav),
                                     jnp.asarray(b32.wav_lengths))
    assert np.array_equal(np.asarray(fl16), np.asarray(fl32))
    assert float(jnp.max(jnp.abs(log16 - log32))) < 1e-2
