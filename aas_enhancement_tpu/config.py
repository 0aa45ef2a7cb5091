"""Configuration tree for the AAS-enhancement TPU framework.

The reference spreads configuration across per-script argparse flags (SURVEY.md §2
"Config/flags": audio conf, model conf, train conf).  Here the whole tree is a single
nested dataclass hierarchy, serializable to/from JSON, with the five driver acceptance
configs (BASELINE.json:7-11) shipped as named presets.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class AudioConfig:
    """STFT / featurization parameters (reference audio_conf, SURVEY.md §2 "STFT featurizer")."""

    sample_rate: int = 16000
    window_size: float = 0.02    # seconds -> n_fft = 320 -> 161 freq bins
    window_stride: float = 0.01  # seconds -> hop = 160
    window: str = "hann"         # "hann" | "hamming"
    center: bool = True          # reflect-pad n_fft//2 on both sides (librosa-style)
    normalize: bool = True       # per-utterance mean/std normalization of log-mag
    stft_impl: str = "auto"      # "jax"/"auto" = XLA segment matmul-DFT (the
                                 # production path — it fuses into the jitted
                                 # step); "pallas" = the standalone fused
                                 # kernels (dsp/api.py rationale)

    @property
    def n_fft(self) -> int:
        return int(self.sample_rate * self.window_size)

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


@dataclass(frozen=True)
class AMConfig:
    """DeepSpeech2-style acoustic model (SURVEY.md §2 "DeepSpeech2-style acoustic model")."""

    rnn_hidden: int = 512
    rnn_layers: int = 4
    rnn_type: str = "gru"        # "gru" | "lstm"
    conv_channels: int = 32
    vocab_size: int = 29         # len(labels.LABELS)
    dtype: str = "float32"       # compute dtype for matmuls ("bfloat16" on TPU)


@dataclass(frozen=True)
class EnhancerConfig:
    """Conv + BLSTM enhancement network (SURVEY.md §2 "Enhancement network", BASELINE.json:5)."""

    conv_channels: int = 32
    conv_layers: int = 2
    rnn_hidden: int = 256
    rnn_layers: int = 2
    mode: str = "mask"           # "mask" (sigmoid mask * noisy mag) | "mapping" (direct mag)
    dtype: str = "float32"


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Spectrogram discriminator (SURVEY.md §2 "Spectrogram discriminator")."""

    channels: tuple = (32, 64, 128)
    dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + loop parameters (reference train conf, SURVEY.md §2 "Config/flags")."""

    objective: str = "aas"       # "paired" | "adversarial" | "acoustic" | "aas"
    batch_size: int = 8          # global batch (split across the data mesh axis)
    lr_g: float = 3e-4
    lr_d: float = 3e-4
    lr_am: float = 3e-4
    adam_b1: float = 0.5         # GAN-friendly beta1 for G/D
    adam_b2: float = 0.999
    momentum: float = 0.9        # SGD momentum for AM pre-training
    max_grad_norm: float = 400.0  # reference clips grads hard (deepspeech-era default)
    lambda_adv: float = 1.0      # weight on adversarial term in the joint AAS loss
    lambda_mrstft: float = 0.0   # weight on the multi-resolution STFT loss in
                                 # the PAIRED objective (0 = off; beyond-
                                 # reference quality term, PAPERS.md Parallel
                                 # WaveGAN)
    gan_loss: str = "lsgan"      # "lsgan" | "bce"
    epochs: int = 10
    steps_per_epoch: int = 0     # 0 = derive from dataset
    lr_anneal: float = 1.0       # per-epoch LR divisor (deepspeech recipe: 1.1);
                                 # lr(epoch) = lr / lr_anneal**epoch, all optimizers
    sortagrad: bool = False      # epoch 0 served strictly shortest-first
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 500
    log_every: int = 10
    eval_every: int = 0          # validate every N steps; 0 = at each epoch end
                                 # (validation runs only when data.val_manifest set)
    eval_batch_size: int = 4     # batch size for in-training validation decode
    prefetch: int = 2            # input batches assembled + device_put ahead of
                                 # the step (producer thread); 0 = synchronous
    grad_accum: int = 1          # microbatches per optimizer update (k > 1
                                 # scans the split batch inside ONE jitted step;
                                 # peak activation memory scales with batch/k)
    profile_dir: str = ""        # capture a jax.profiler trace of profile_steps
                                 # steps starting at the first step >=
                                 # profile_start (SURVEY.md §5 tracing)
    profile_start: int = 10      # trace begins past warmup compiles
    profile_steps: int = 3
    spec_augment: bool = False   # SpecAugment (Park 2019) on AM-pretrain
                                 # features: time+freq stripe masks, valid
                                 # region only (beyond-reference regularizer
                                 # for small corpora; eval never masks)
    sa_time_masks: int = 2
    sa_time_width: int = 30      # max frames per time stripe
    sa_freq_masks: int = 2
    sa_freq_width: int = 13      # max bins per frequency stripe
    streaming_finetune: bool = False  # train G through the block-bidirectional
                                 # streaming forward (models/enhancer.py::
                                 # blockwise_apply) so deployment-time chunked
                                 # inference matches training (VERDICT r2 #3)
    streaming_finetune_am: bool = False  # "am" objective trains through the
                                 # block-streaming AM forward (models/am.py::
                                 # am_blockwise_apply) at the same stream_*
                                 # operating point — live-deployment AM
                                 # adaptation (scripts/am_streaming_finetune.py)
    am_through_enhancer: bool = False  # "am" objective consumes the FROZEN
                                 # enhancer's (state.g_params) output features
                                 # instead of the raw input — adapts the AM to
                                 # the enhanced-feature distribution it sees in
                                 # the deployed pipeline; composes with both
                                 # streaming_finetune flags to mirror the live
                                 # chain exactly
    stream_chunk_s: float = 1.0       # must match the inference operating
    stream_lookahead_s: float = 0.2   # point (streaming.StreamingEnhancer)
    stream_history_s: float = 1.0
    distill_lambda: float = 0.0  # "am" objective: weight of a posterior-anchor
                                 # KL term tying the ADAPTED AM's frame
                                 # posteriors to the base AM's (the params the
                                 # run started from, offline forward, same
                                 # features).  Live-deployment adaptation
                                 # (streaming_finetune_am / am_through_enhancer)
                                 # measurably trades the hybrid beam rescore's
                                 # log-prob geometry for greedy gains
                                 # (am_streaming_finetune_r4.json: 0-10 dB live
                                 # hybrid 6.7 -> 8.8); this term lets CTC move
                                 # the posteriors only where the transcript
                                 # demands it (VERDICT r4 #1c)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Only a data axis is needed for parity (BASELINE.json:5:
    "data-parallel over the TPU mesh"); a model axis is accepted for forward-compat."""

    data_axis: str = "data"
    num_devices: int = 0         # 0 = all visible devices


@dataclass(frozen=True)
class DataConfig:
    """Host-side data pipeline (SURVEY.md §2 "Manifest data pipeline")."""

    train_manifest: str = ""
    clean_manifest: str = ""     # unpaired clean corpus for the discriminator
    val_manifest: str = ""
    max_duration: float = 16.0   # seconds; longer utterances dropped
    min_duration: float = 0.3
    num_buckets: int = 4         # padded time-shape buckets (bounds jit recompiles)
    augment: bool = False
    augment_speed: bool = True   # speed perturb is label-DESTRUCTIVE on the
                                 # formant-coded synthetic corpus (BASELINE.md
                                 # screening table) — disable it there
    augment_gain: bool = True
    use_grain: bool = False      # multi-process decode workers (data/grain_loader.py)
    grain_workers: int = 2
    noise_dir: str = ""
    noise_prob: float = 0.4
    noise_snr_range: tuple = (0.0, 15.0)
    feed_dtype: str = "float32"  # "int16" halves host->device feed bytes (the
                                 # source wavs are PCM16; the jitted step converts
                                 # back to f32 on device — train/objectives.py)
    native_decode: bool = True   # C++ parallel wav decode + batch packing
                                 # (native/audio/wav_batch.cc) when augment is
                                 # off; transparent python fallback


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    am: AMConfig = field(default_factory=AMConfig)
    enhancer: EnhancerConfig = field(default_factory=EnhancerConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)

    # ------------------------------------------------------------------ io
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                fields = {f.name: f.type for f in dataclasses.fields(tp)}
                kwargs = {}
                for k, v in val.items():
                    if k not in fields:
                        continue
                    sub = _FIELD_TYPES.get((tp.__name__, k))
                    if sub is not None and isinstance(v, dict):
                        kwargs[k] = build(sub, v)
                    elif isinstance(v, list):
                        kwargs[k] = tuple(v)
                    else:
                        kwargs[k] = v
                return tp(**kwargs)
            return val

        return build(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELD_TYPES = {
    ("Config", "audio"): AudioConfig,
    ("Config", "am"): AMConfig,
    ("Config", "enhancer"): EnhancerConfig,
    ("Config", "discriminator"): DiscriminatorConfig,
    ("Config", "train"): TrainConfig,
    ("Config", "mesh"): MeshConfig,
    ("Config", "data"): DataConfig,
}


# ---------------------------------------------------------------------------
# Named presets: the five driver acceptance configs (BASELINE.json:7-11).
# ---------------------------------------------------------------------------

def preset(name: str) -> Config:
    """The five graded end-to-end configs, smallest first (SURVEY.md §4)."""
    base = Config()
    if name == "single_utterance":        # config 1 (BASELINE.json:7)
        return base.replace(train=dataclasses.replace(base.train, objective="enhance_only",
                                                      batch_size=1))
    if name == "paired":                  # config 2 (BASELINE.json:8)
        return base.replace(train=dataclasses.replace(base.train, objective="paired"))
    if name == "adversarial":             # config 3 (BASELINE.json:9)
        return base.replace(train=dataclasses.replace(base.train, objective="adversarial"))
    if name == "acoustic":                # config 4 (BASELINE.json:10)
        return base.replace(train=dataclasses.replace(base.train, objective="acoustic"))
    if name == "aas":                     # config 5 (BASELINE.json:11)
        return base.replace(train=dataclasses.replace(base.train, objective="aas"))
    raise ValueError(f"unknown preset: {name!r}")
