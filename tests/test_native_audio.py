"""Native C++ wav batch decoder vs the pure-python reader (data/wav.py).

Reference parity: the reference's audio decode is native SoX (SURVEY.md §2
"NATIVE: SoX / audio codecs"); the rebuild's native path must be bit-identical
to the python oracle so the two are interchangeable (data/dataset.py uses
native when available, python otherwise)."""

import numpy as np
import pytest

from aas_enhancement_tpu.config import AudioConfig, DataConfig
from aas_enhancement_tpu.data import native_audio
from aas_enhancement_tpu.data.dataset import AudioDataset
from aas_enhancement_tpu.data.synthetic import generate_corpus
from aas_enhancement_tpu.data.wav import read_wav, write_wav

# Loading never builds implicitly (ADVICE r2) — the test suite builds here.
pytestmark = pytest.mark.skipif(not native_audio.build(),
                                reason="native lib unavailable (no compiler)")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return generate_corpus(str(tmp_path_factory.mktemp("na")), n_utts=10, seed=3)


def _manifest_paths(manifest):
    return [line.split(",")[0] for line in open(manifest).read().splitlines()]


def test_batch_decode_bit_identical(corpus):
    paths = _manifest_paths(corpus["noisy"])
    bucket = max(len(read_wav(p)[0]) for p in paths) + 123
    out, lengths = native_audio.batch_decode(paths, bucket, expected_sr=16000)
    assert out.shape == (len(paths), bucket)
    for j, p in enumerate(paths):
        ref, sr = read_wav(p)
        assert sr == 16000
        assert lengths[j] == len(ref)
        assert np.array_equal(out[j, : len(ref)], ref), f"row {j} differs"
        assert not out[j, len(ref):].any(), "padding not zeroed"


def test_truncation_to_bucket(corpus):
    paths = _manifest_paths(corpus["noisy"])[:3]
    bucket = 1000  # shorter than every utterance
    out, lengths = native_audio.batch_decode(paths, bucket)
    for j, p in enumerate(paths):
        ref, _ = read_wav(p)
        assert lengths[j] == bucket
        assert np.array_equal(out[j], ref[:bucket])


def test_sample_rate_mismatch_raises(tmp_path, corpus):
    paths = _manifest_paths(corpus["noisy"])[:2]
    bad = str(tmp_path / "bad_sr.wav")
    write_wav(bad, np.zeros(100, np.float32), 8000)
    with pytest.raises(ValueError, match="sample rate"):
        native_audio.batch_decode(paths + [bad], 2000, expected_sr=16000)


def test_dataset_native_matches_python(corpus):
    """make_batch through the native path == python path, bit-for-bit."""
    kw = dict(manifest_path=corpus["noisy"], audio=AudioConfig())
    ds_nat = AudioDataset(data=DataConfig(native_decode=True), **kw,
                          paired_manifest=corpus["clean"])
    ds_py = AudioDataset(data=DataConfig(native_decode=False), **kw,
                         paired_manifest=corpus["clean"])
    for bn, bp in zip(ds_nat.batches(4, seed=0, epoch=0),
                      ds_py.batches(4, seed=0, epoch=0)):
        assert np.array_equal(bn.wav, bp.wav)
        assert np.array_equal(bn.wav_lengths, bp.wav_lengths)
        assert np.array_equal(bn.clean_wav, bp.clean_wav)
        assert np.array_equal(bn.labels, bp.labels)


def test_multichannel_first_channel(tmp_path):
    """Stereo PCM16: native takes channel 0, same as the python reader."""
    import struct

    sr = 16000
    left = (np.arange(50, dtype=np.float32) / 100.0)
    right = -left
    inter = np.empty(100, np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = np.round(np.clip(inter, -1, 1) * 32767.0).astype("<i2").tobytes()
    path = str(tmp_path / "stereo.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
    ref, _ = read_wav(path)
    out, lengths = native_audio.batch_decode([path], 64)
    assert lengths[0] == len(ref) == 50
    assert np.array_equal(out[0, :50], ref)


def test_i16_batch_matches_python_chain(corpus):
    """int16 native transport == python read_wav -> _to_int16, bit-for-bit
    (PCM16 sources: the native path is a direct copy)."""
    from aas_enhancement_tpu.data.dataset import _to_int16

    paths = _manifest_paths(corpus["noisy"])
    bucket = max(len(read_wav(p)[0]) for p in paths) + 50
    out, lengths = native_audio.batch_decode(paths, bucket, expected_sr=16000,
                                             dtype="int16")
    assert out.dtype == np.int16
    for j, p in enumerate(paths):
        ref = _to_int16(read_wav(p)[0])
        assert lengths[j] == len(ref)
        assert np.array_equal(out[j, : len(ref)], ref), f"row {j} differs"
        assert not out[j, len(ref):].any()


def test_dataset_int16_native_matches_python(corpus):
    kw = dict(manifest_path=corpus["noisy"], audio=AudioConfig())
    ds_nat = AudioDataset(data=DataConfig(native_decode=True,
                                          feed_dtype="int16"), **kw)
    ds_py = AudioDataset(data=DataConfig(native_decode=False,
                                         feed_dtype="int16"), **kw)
    for bn, bp in zip(ds_nat.batches(4, seed=0, epoch=0),
                      ds_py.batches(4, seed=0, epoch=0)):
        assert bn.wav.dtype == bp.wav.dtype == np.int16
        assert np.array_equal(bn.wav, bp.wav)
        assert np.array_equal(bn.wav_lengths, bp.wav_lengths)
