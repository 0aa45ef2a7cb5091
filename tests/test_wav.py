import numpy as np

from aas_enhancement_tpu.data.wav import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_scipy_compat(tmp_path):
    """Our writer must be readable by scipy and vice versa."""
    from scipy.io import wavfile
    x = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    p1 = str(tmp_path / "ours.wav")
    write_wav(p1, x, 16000)
    sr, y = wavfile.read(p1)
    assert sr == 16000
    np.testing.assert_allclose(y.astype(np.float32) / 32768.0, x, atol=1e-3)

    p2 = str(tmp_path / "scipy.wav")
    wavfile.write(p2, 16000, (x * 32767).astype(np.int16))
    z, sr2 = read_wav(p2)
    assert sr2 == 16000
    np.testing.assert_allclose(z, x, atol=1e-3)
