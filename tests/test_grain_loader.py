"""Grain multi-worker loader matches the in-process iterator exactly."""

import numpy as np
import pytest

from aas_enhancement_tpu.config import AudioConfig, DataConfig
from aas_enhancement_tpu.data.dataset import AudioDataset
from aas_enhancement_tpu.data.grain_loader import grain_batches
from aas_enhancement_tpu.data.synthetic import generate_corpus


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    corpus = generate_corpus(str(tmp_path_factory.mktemp("g")), n_utts=10, seed=4)
    return AudioDataset(corpus["noisy"], AudioConfig(), DataConfig(num_buckets=2))


@pytest.mark.parametrize("workers", [0, 2])
@pytest.mark.slow
def test_grain_matches_inprocess(ds, workers):
    ref = list(ds.batches(4, seed=0, epoch=0))
    got = list(grain_batches(ds, 4, seed=0, epoch=0, worker_count=workers))
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a.wav, b.wav)
        np.testing.assert_array_equal(a.labels, b.labels)
        np.testing.assert_array_equal(a.wav_lengths, b.wav_lengths)
        assert a.real_size == b.real_size
