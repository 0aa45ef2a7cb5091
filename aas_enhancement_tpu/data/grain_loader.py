"""Grain-backed multi-worker data loading.

SURVEY.md §2 rebuild obligation #5: "SoX/librosa decode -> host-side numpy/grain
decode streaming into device feature extraction".  The plain-numpy iterator in
dataset.py is the zero-dependency path; this wrapper runs the same batch
construction inside grain's deterministic multi-process workers so wav decode and
padding never block the device step (the reference used torch DataLoader workers
for the same reason).

Falls back to the in-process iterator if grain is unavailable.
"""

from __future__ import annotations

from typing import Iterator

from aas_enhancement_tpu.data.dataset import AudioDataset, Batch, epoch_chunks


class _EpochBatchSource:
    """Random-access view of one epoch's batch list (grain RandomAccessDataSource)."""

    def __init__(self, dataset: AudioDataset, batch_size: int, seed: int, epoch: int,
                 sorted_order: bool = False, start: int = 0):
        self.ds = dataset
        self.epoch = epoch
        # The epoch's batch composition (items only — cheap) comes from the same
        # epoch_chunks as the in-process iterator, so both paths serve identical
        # epochs; decode happens in __getitem__, i.e. inside grain workers.
        self._chunks = epoch_chunks(dataset, batch_size, seed, epoch,
                                    sorted_order=sorted_order)[start:]

    def __len__(self) -> int:
        return len(self._chunks)

    def __getitem__(self, idx: int) -> dict:
        chunk, orig = self._chunks[idx]
        b = self.ds.make_batch(chunk, real_size=orig, epoch=self.epoch)
        out = {"wav": b.wav, "wav_lengths": b.wav_lengths, "labels": b.labels,
               "label_paddings": b.label_paddings, "real_size": orig}
        if b.clean_wav is not None:
            out["clean_wav"] = b.clean_wav
        return out


def grain_batches(dataset: AudioDataset, batch_size: int, seed: int = 0,
                  epoch: int = 0, worker_count: int = 2,
                  sorted_order: bool = False, start: int = 0) -> Iterator[Batch]:
    """Epoch iterator with decode/pad in grain worker processes."""
    try:
        import grain.python as grain
    except ImportError:
        yield from dataset.batches(batch_size, seed, epoch,
                                   sorted_order=sorted_order, start=start)
        return

    source = _EpochBatchSource(dataset, batch_size, seed, epoch,
                               sorted_order=sorted_order, start=start)
    sampler = grain.IndexSampler(
        num_records=len(source), shard_options=grain.NoSharding(),
        shuffle=False, num_epochs=1, seed=seed)
    loader = grain.DataLoader(data_source=source, sampler=sampler,
                              worker_count=worker_count)
    for rec in loader:
        yield Batch(wav=rec["wav"], wav_lengths=rec["wav_lengths"],
                    labels=rec["labels"], label_paddings=rec["label_paddings"],
                    clean_wav=rec.get("clean_wav"),
                    real_size=int(rec["real_size"]))
