"""Host-side data pipeline: manifests -> bucketed, padded waveform batches.

Reference capability (SURVEY.md §2 "Manifest data pipeline", "Augmentation"):
`SpectrogramDataset` + `BucketingSampler` + collate that pads to max-T and emits
length tensors.  TPU-first differences:

- The host ships PADDED WAVEFORMS (small: 16k samples/s), not spectrograms; STFT/
  featurization runs on-device inside the jitted train step (BASELINE.json:5
  "host-side audio decode streaming into device-side feature extraction").
- Padded shapes are drawn from a SMALL FIXED SET of duration buckets so each bucket
  compiles exactly one XLA program (SURVEY.md §7 "Variable-length audio vs XLA
  static shapes").  Batches are formed within a bucket (duration-sorted, shuffled
  per epoch) — the BucketingSampler equivalent.
- Labels are padded to one fixed U per dataset (max transcript, rounded up to a
  multiple of 8) with optax-style {0,1} label_paddings.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from aas_enhancement_tpu.config import AudioConfig, DataConfig
from aas_enhancement_tpu.data.manifest import read_manifest, read_transcript
from aas_enhancement_tpu.data.wav import read_wav
from aas_enhancement_tpu.labels import LABELS, encode


@dataclasses.dataclass
class Batch:
    """One padded training batch (numpy, host-side; a pytree for device_put)."""

    wav: np.ndarray              # [B, N] float32
    wav_lengths: np.ndarray      # [B] int32, valid samples
    labels: np.ndarray           # [B, U] int32
    label_paddings: np.ndarray   # [B, U] float32, 1.0 = padded
    clean_wav: np.ndarray | None = None   # [B, N] paired clean (same padding)
    real_size: int = 0                    # rows before repeat-padding (0 = all real)

    @property
    def size(self) -> int:
        return self.real_size or self.wav.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class AudioDataset:
    """Manifest-backed dataset of (wav, transcript) with duration bucketing."""

    def __init__(self, manifest_path: str, audio: AudioConfig, data: DataConfig,
                 labels: str = LABELS, paired_manifest: str | None = None):
        self.audio = audio
        self.data = data
        self.labels = labels
        self.augment = None
        if data.augment:
            from aas_enhancement_tpu.data.augment import NoiseInjector, augment_wav
            noise = (NoiseInjector(data.noise_dir, audio.sample_rate)
                     if data.noise_dir else None)

            def _aug(w, idx: int, epoch: int):
                # Position-deterministic draws: seeded per (item, epoch), so a
                # resumed run, a grain worker, and an uninterrupted run all see
                # identical augmented audio for the same item in the same epoch.
                rng = np.random.default_rng((0xA46, epoch, idx))
                return augment_wav(w, rng, noise=noise, noise_prob=data.noise_prob,
                                   snr_range=tuple(data.noise_snr_range),
                                   speed=data.augment_speed,
                                   gain=data.augment_gain)

            self.augment = _aug
        entries = read_manifest(manifest_path)
        paired = read_manifest(paired_manifest) if paired_manifest else None
        if paired is not None and len(paired) != len(entries):
            raise ValueError("paired manifest length mismatch")

        self.items = []
        sr = audio.sample_rate
        # Speed perturbation can lengthen a wav by up to 1/0.9; bucket by the
        # worst-case augmented length so augmented audio never outgrows its
        # bucket (which would silently truncate speech the transcript covers).
        length_margin = 1.12 if data.augment else 1.0
        for i, (wav_path, txt_path) in enumerate(entries):
            n = _wav_num_samples(wav_path)
            dur = n / sr
            if dur < data.min_duration or dur > data.max_duration:
                continue
            self.items.append({
                "idx": i,            # stable manifest position (augment RNG key)
                "wav": wav_path,
                "txt": txt_path,
                "clean_wav": paired[i][0] if paired else None,
                "num_samples": int(n * length_margin),
            })
        if not self.items:
            raise ValueError(f"no usable utterances in {manifest_path}")

        # Fixed label width U for the whole dataset.
        max_u = 1
        for it in self.items:
            ids = encode(read_transcript(it["txt"]), self.labels)
            it["label_ids"] = ids
            max_u = max(max_u, len(ids))
        self.max_label_len = _round_up(max_u, 8)

        # Duration buckets: boundaries at quantiles of num_samples, each rounded up
        # to a whole second so bucket shapes are stable across similar corpora.
        lens = np.array([it["num_samples"] for it in self.items])
        n_buckets = min(data.num_buckets, len(self.items))
        qs = np.quantile(lens, np.linspace(1.0 / n_buckets, 1.0, n_buckets))
        self.bucket_sizes = sorted({int(_round_up(int(q), sr)) for q in qs})

    def __len__(self) -> int:
        return len(self.items)

    def bucket_of(self, num_samples: int) -> int:
        for b in self.bucket_sizes:
            if num_samples <= b:
                return b
        return self.bucket_sizes[-1]

    def _load(self, it: dict, bucket: int,
              epoch: int = 0) -> tuple[np.ndarray, int, np.ndarray | None]:
        wav, sr = read_wav(it["wav"])
        if sr != self.audio.sample_rate:
            raise ValueError(f"{it['wav']}: sample rate {sr} != {self.audio.sample_rate}")
        if self.augment is not None and it["clean_wav"] is None:
            # Augmentation only for unpaired training inputs — paired targets must
            # stay sample-aligned with their clean side.
            wav = self.augment(wav, it["idx"], epoch)
        n = min(len(wav), bucket)
        out = np.zeros(bucket, np.float32)
        out[:n] = wav[:n]
        clean = None
        if it["clean_wav"]:
            cw, _ = read_wav(it["clean_wav"])
            clean = np.zeros(bucket, np.float32)
            clean[: min(len(cw), bucket)] = cw[: min(len(cw), bucket)]
        return out, n, clean

    def make_batch(self, items: list[dict], real_size: int = 0,
                   bucket_override: int = 0, epoch: int = 0) -> Batch:
        bucket = bucket_override or max(self.bucket_of(it["num_samples"])
                                        for it in items)
        u = self.max_label_len
        b = len(items)
        labels = np.zeros((b, u), np.int32)
        label_pad = np.ones((b, u), np.float32)
        has_clean = all(it["clean_wav"] for it in items)
        for j, it in enumerate(items):
            ids = it["label_ids"][:u]
            labels[j, : len(ids)] = ids
            label_pad[j, : len(ids)] = 0.0

        # Native fast path: parallel C++ decode + pack (bit-identical to the
        # python reader — tests/test_native_audio.py); with feed_dtype=int16 a
        # PCM16 corpus packs by direct copy, no float round-trip.  Augmentation
        # needs per-item numpy transforms, so it keeps the python path.
        feed = self.data.feed_dtype
        native = None
        if self.data.native_decode and self.augment is None:
            from aas_enhancement_tpu.data import native_audio
            native = native_audio.batch_decode(
                [it["wav"] for it in items], bucket,
                expected_sr=self.audio.sample_rate, dtype=feed)
        if native is not None:
            wav, wav_lengths = native
            clean = None
            if has_clean:
                clean, _ = native_audio.batch_decode(
                    [it["clean_wav"] for it in items], bucket,
                    expected_sr=self.audio.sample_rate, dtype=feed)
            return Batch(wav=wav, wav_lengths=wav_lengths, labels=labels,
                         label_paddings=label_pad, clean_wav=clean,
                         real_size=real_size or len(items))
        else:
            wav = np.zeros((b, bucket), np.float32)
            wav_lengths = np.zeros(b, np.int32)
            clean = np.zeros((b, bucket), np.float32)
            for j, it in enumerate(items):
                w, n, c = self._load(it, bucket, epoch)
                wav[j] = w
                wav_lengths[j] = n
                if has_clean and c is not None:
                    clean[j] = c
        if self.data.feed_dtype == "int16":
            # Halve host->device feed bytes: wavs are PCM16 at the source, so
            # int16 transport is lossless for unaugmented audio (augmented audio
            # re-quantizes at -96 dBFS resolution).  Device-side conversion back
            # to f32 happens inside the jitted step (train/objectives.py).
            wav = _to_int16(wav)
            if has_clean:
                clean = _to_int16(clean)
        return Batch(wav=wav, wav_lengths=wav_lengths, labels=labels,
                     label_paddings=label_pad,
                     clean_wav=clean if has_clean else None,
                     real_size=real_size or len(items))

    def num_batches(self, batch_size: int) -> int:
        """Batches per epoch, computed from item metadata — no wav decode
        (the count is epoch-invariant: shuffling changes order, not sizes)."""
        by_bucket: dict[int, int] = {}
        for it in self.items:
            b = self.bucket_of(it["num_samples"])
            by_bucket[b] = by_bucket.get(b, 0) + 1
        return sum(-(-n // batch_size) for n in by_bucket.values())

    def batches(self, batch_size: int, seed: int = 0, epoch: int = 0,
                drop_last: bool = False, sorted_order: bool = False,
                start: int = 0) -> Iterator[Batch]:
        """Epoch iterator: shuffle within duration buckets, then shuffle batch order
        (BucketingSampler parity).  With sorted_order=True the epoch is served
        strictly shortest-first — the explicit SortaGrad epoch (reference
        deepspeech recipe, SURVEY.md §2 "Train: acoustic model").  `start` skips
        the first N batches WITHOUT decoding them (resume fast-forward; augment
        draws are position-keyed so the skip cannot shift them)."""
        chunks = epoch_chunks(self, batch_size, seed, epoch,
                              drop_last=drop_last, sorted_order=sorted_order)
        for chunk, orig in chunks[start:]:
            yield self.make_batch(chunk, real_size=orig, epoch=epoch)


def epoch_chunks(dataset: AudioDataset, batch_size: int, seed: int = 0,
                 epoch: int = 0, drop_last: bool = False,
                 sorted_order: bool = False) -> list[tuple[list[dict], int]]:
    """One epoch's batch composition: [(items, real_size)], decode-free.

    Shared by the in-process iterator and the grain source so both serve
    byte-identical epochs.  sorted_order=True keeps strict duration order
    (SortaGrad); otherwise items shuffle within buckets and (for epoch > 0)
    batch order shuffles too.
    """
    rng = np.random.default_rng(seed + epoch * 9973)
    by_bucket: dict[int, list[dict]] = {}
    for it in dataset.items:
        by_bucket.setdefault(dataset.bucket_of(it["num_samples"]), []).append(it)

    chunks = []
    for bucket in sorted(by_bucket):
        items = by_bucket[bucket]
        if sorted_order:
            order = np.argsort([it["num_samples"] for it in items], kind="stable")
        else:
            order = rng.permutation(len(items))
        for i in range(0, len(items), batch_size):
            chunk = [items[k] for k in order[i: i + batch_size]]
            if drop_last and len(chunk) < batch_size:
                continue
            # Pad short final batches by repeating items (keeps shapes static).
            orig = len(chunk)
            while 0 < len(chunk) < batch_size:
                chunk.append(chunk[len(chunk) % orig])
            chunks.append((chunk, orig))
    if epoch > 0 and not sorted_order:
        rng.shuffle(chunks)
    return chunks


class UnpairedCleanStream:
    """Endless stream of clean batches for the discriminator's real side
    (SURVEY.md §3.2: 'unpaired clean manifest')."""

    def __init__(self, dataset: AudioDataset, batch_size: int, seed: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._draws = 0   # per-call counter: the augment-RNG "epoch" key, so
                          # clean-side augmentation varies per draw (not frozen
                          # at epoch 0) yet stays position-deterministic for
                          # resume fast-forward (skip() advances it too)

    def next_batch(self, bucket: int) -> Batch:
        """A clean batch padded to `bucket` samples (matches the noisy batch shape)."""
        idx = self.rng.integers(0, len(self.ds.items), size=self.batch_size)
        items = [self.ds.items[i] for i in idx]
        self._draws += 1
        return self.ds.make_batch(items, bucket_override=bucket,
                                  epoch=self._draws - 1)

    def skip(self) -> None:
        """Advance the stream without decoding (used by resume fast-forward so a
        resumed run sees the same clean batches as an uninterrupted one)."""
        self.rng.integers(0, len(self.ds.items), size=self.batch_size)
        self._draws += 1


def _to_int16(x: np.ndarray) -> np.ndarray:
    # In-place ops: np.round allocates 3 temporaries and costs ~0.8 s on a
    # 128 x 8 s batch; this chain is ~4x faster and numerically identical
    # (clip-then-rint == round-then-clip at the +/-32k integer boundaries).
    y = x * 32768.0
    np.clip(y, -32768.0, 32767.0, out=y)
    np.rint(y, out=y)
    return y.astype(np.int16)


def _wav_num_samples(path: str) -> int:
    """Cheap duration probe: parse RIFF headers without decoding samples."""
    import struct
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:4] != b"RIFF":
            raise ValueError(f"{path}: not RIFF")
        bits = 16
        n_ch = 1
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                raise ValueError(f"{path}: no data chunk")
            cid, sz = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                body = f.read(sz + (sz & 1))
                _, n_ch, _, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                return sz // (n_ch * bits // 8)
            else:
                f.seek(sz + (sz & 1), 1)
