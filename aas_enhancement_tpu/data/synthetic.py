"""Synthetic speech fixtures (CHiME-4 stand-in).

CHiME-4/WSJ/Librispeech are licensed and absent from this machine (SURVEY.md §6/§7
"Data absence"), so the framework ships a deterministic synthetic corpus generator:

- Each transcript character maps to a fixed formant-pair tone with vibrato and an
  amplitude envelope, giving a stable audio<->text correspondence that a small CTC
  acoustic model can genuinely learn (needed for the acoustic-supervision configs).
- Noise kinds (white / band-passed / babble-ish AM noise) are mixed at a target SNR to
  produce the "simulated noisy" side, mirroring CHiME-4 simulated data.
- Corpora are written as wav+txt files plus a CSV manifest `wav_path,txt_path`
  matching the reference's manifest format (SURVEY.md §2 "Manifest data pipeline").
"""

from __future__ import annotations

import os

import numpy as np

from aas_enhancement_tpu.labels import LABELS
from aas_enhancement_tpu.data.wav import write_wav

# Characters usable in synthetic transcripts (skip blank at index 0).
_CHARS = [c for c in LABELS[1:] if c != " "]


def _char_formants(c: str) -> tuple[float, float]:
    """Deterministic per-character formant pair in speech-ish ranges."""
    i = _CHARS.index(c) if c in _CHARS else 0
    f1 = 220.0 + 40.0 * (i % 7)           # 220..460 Hz
    f2 = 900.0 + 150.0 * (i % 11)         # 900..2400 Hz
    return f1, f2


def synth_utterance(text: str, sample_rate: int = 16000, char_dur: float = 0.08,
                    seed: int = 0) -> np.ndarray:
    """Transcript -> clean speech-like waveform."""
    rng = np.random.default_rng(seed)
    n_char = int(char_dur * sample_rate)
    pieces = []
    for ch in text:
        if ch == " ":
            pieces.append(np.zeros(n_char, np.float32))
            continue
        f1, f2 = _char_formants(ch)
        t = np.arange(n_char) / sample_rate
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 2 * np.pi))
        env = np.hanning(n_char).astype(np.float32) ** 0.5
        x = (0.6 * np.sin(2 * np.pi * f1 * vib * t)
             + 0.35 * np.sin(2 * np.pi * f2 * vib * t)
             + 0.05 * rng.standard_normal(n_char))
        pieces.append((x * env).astype(np.float32))
    wav = np.concatenate(pieces) if pieces else np.zeros(n_char, np.float32)
    peak = np.max(np.abs(wav)) + 1e-8
    return (0.7 * wav / peak).astype(np.float32)


def make_noise(n: int, kind: str = "white", seed: int = 0,
               sample_rate: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n).astype(np.float32)
    if kind == "band":
        # Crude band-pass via FFT zeroing (300..3000 Hz).
        spec = np.fft.rfft(x)
        freqs = np.fft.rfftfreq(n, 1.0 / sample_rate)
        spec[(freqs < 300) | (freqs > 3000)] = 0
        x = np.fft.irfft(spec, n=n).astype(np.float32)
    elif kind == "babble":
        am = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 3.0 * np.arange(n) / sample_rate
                                       + rng.uniform(0, 6.28)))
        x = (x * am).astype(np.float32)
    return x / (np.std(x) + 1e-8)


def mix_at_snr(clean: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    """Additive mix at a target SNR (clean-signal power over noise power)."""
    if len(noise) < len(clean):
        noise = np.tile(noise, int(np.ceil(len(clean) / len(noise))))
    noise = noise[: len(clean)]
    p_clean = np.mean(clean ** 2) + 1e-12
    p_noise = np.mean(noise ** 2) + 1e-12
    scale = np.sqrt(p_clean / (p_noise * 10.0 ** (snr_db / 10.0)))
    mixed = clean + scale * noise
    peak = np.max(np.abs(mixed))
    if peak > 1.0:
        mixed = mixed / peak
    return mixed.astype(np.float32)


def random_transcript(rng: np.random.Generator, n_words: tuple[int, int] = (2, 5),
                      word_len: tuple[int, int] = (2, 6)) -> str:
    words = []
    for _ in range(int(rng.integers(*n_words))):
        k = int(rng.integers(*word_len))
        words.append("".join(rng.choice(_CHARS, size=k)))
    return " ".join(words)


def generate_corpus(out_dir: str, n_utts: int = 16, seed: int = 0,
                    sample_rate: int = 16000,
                    snr_range: tuple[float, float] = (0.0, 10.0),
                    vocab_chars: int = 0,
                    n_words: tuple[int, int] = (2, 5),
                    word_len: tuple[int, int] = (2, 6)) -> dict[str, str]:
    """Write a paired clean/noisy synthetic corpus + manifests.

    Returns {"clean": clean_manifest_path, "noisy": noisy_manifest_path}.
    vocab_chars > 0 restricts transcripts to the first N characters (easier CTC
    tasks); n_words/word_len control transcript (hence utterance) length.
    """
    rng = np.random.default_rng(seed)
    chars = _CHARS[:vocab_chars] if vocab_chars else _CHARS
    for sub in ("clean", "noisy", "txt"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    clean_lines, noisy_lines = [], []
    for i in range(n_utts):
        words = []
        for _ in range(int(rng.integers(*n_words))):
            k = int(rng.integers(*word_len))
            words.append("".join(rng.choice(chars, size=k)))
        text = " ".join(words)

        clean = synth_utterance(text, sample_rate, seed=seed + i)
        kind = ["white", "band", "babble"][i % 3]
        noise = make_noise(len(clean), kind, seed=seed + 1000 + i, sample_rate=sample_rate)
        snr = float(rng.uniform(*snr_range))
        noisy = mix_at_snr(clean, noise, snr)

        cpath = os.path.join(out_dir, "clean", f"utt{i:04d}.wav")
        npath = os.path.join(out_dir, "noisy", f"utt{i:04d}.wav")
        tpath = os.path.join(out_dir, "txt", f"utt{i:04d}.txt")
        write_wav(cpath, clean, sample_rate)
        write_wav(npath, noisy, sample_rate)
        with open(tpath, "w") as f:
            f.write(text)
        clean_lines.append(f"{cpath},{tpath}")
        noisy_lines.append(f"{npath},{tpath}")

    clean_manifest = os.path.join(out_dir, "clean_manifest.csv")
    noisy_manifest = os.path.join(out_dir, "noisy_manifest.csv")
    with open(clean_manifest, "w") as f:
        f.write("\n".join(clean_lines) + "\n")
    with open(noisy_manifest, "w") as f:
        f.write("\n".join(noisy_lines) + "\n")
    return {"clean": clean_manifest, "noisy": noisy_manifest}
