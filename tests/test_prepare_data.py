"""prepare_data CLI: synthetic, from-dir, and CHiME-4-layout modes."""

import json
import os

import numpy as np

from aas_enhancement_tpu.cli.prepare_data import main
from aas_enhancement_tpu.data.manifest import read_manifest
from aas_enhancement_tpu.data.wav import write_wav


def test_synthetic_mode(tmp_path, capsys):
    main(["--out-dir", str(tmp_path), "--n-utts", "4", "--seed", "3"])
    out = json.loads(capsys.readouterr().out)
    assert out["utterances"] == 4
    assert len(read_manifest(out["noisy"])) == 4


def test_from_dir_mode(tmp_path, capsys):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        write_wav(str(src / f"u{i}.wav"),
                  np.zeros(1600, np.float32), 16000)
        (src / f"u{i}.txt").write_text("HELLO")
    main(["--out-dir", str(tmp_path / "out"), "--from-dir", str(src)])
    out = json.loads(capsys.readouterr().out)
    assert out["utterances"] == 3


def test_chime4_layout(tmp_path, capsys):
    root = tmp_path / "CHiME4"
    iso = root / "data" / "audio" / "16kHz" / "isolated" / "dt05_simu"
    trn = root / "data" / "transcriptions" / "dt05_simu"
    iso.mkdir(parents=True)
    trn.mkdir(parents=True)
    for utt in ("F01_050C0101_BUS", "M02_051C0102_CAF"):
        for ch in ("CH1", "CH5"):
            write_wav(str(iso / f"{utt}.{ch}.wav"),
                      np.zeros(1600, np.float32), 16000)
        (trn / f"{utt}.trn").write_text("SOME WORDS")
    main(["--out-dir", str(tmp_path / "out"), "--chime4-dir", str(root),
          "--chime4-split", "dt05_simu", "--channel", "CH5"])
    out = json.loads(capsys.readouterr().out)
    assert out["utterances"] == 2
    assert out["missing_transcripts"] == 0
    entries = read_manifest(out["manifest"])
    assert all(".CH5." in w for w, _ in entries)
