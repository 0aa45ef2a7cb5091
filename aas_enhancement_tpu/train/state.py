"""Train state pytrees and optimizer construction.

Reference capability: per-script optimizer setup (SGD+momentum for the AM, Adam for
G/D — SURVEY.md §3.1/§3.2) with hard gradient clipping.  Here one flax.struct pytree
carries every network + optimizer state so a full AAS step is a single pure function
(state, batch) -> (state, metrics) under jit with donated buffers.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from aas_enhancement_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    """All mutable training state for any objective.

    Unused networks for a given objective hold empty dicts ({}), which jit treats as
    static pytree structure with zero cost.
    """

    step: jnp.ndarray                     # int32 scalar
    rng: jax.Array
    g_params: Any = flax.struct.field(default_factory=dict)
    g_opt: Any = flax.struct.field(default_factory=dict)
    d_params: Any = flax.struct.field(default_factory=dict)
    d_opt: Any = flax.struct.field(default_factory=dict)
    am_params: Any = flax.struct.field(default_factory=dict)   # frozen during AAS
    am_opt: Any = flax.struct.field(default_factory=dict)      # used only in AM pretrain


def lr_schedule(cfg: Config, base_lr: float):
    """Per-epoch staircase anneal: lr / lr_anneal**epoch (deepspeech recipe,
    SURVEY.md §2 'Train: acoustic model' — "LR anneal").

    Always returns a callable so the optimizer state structure (schedule step
    count) is identical whether or not annealing is enabled.  The epoch length
    comes from cfg.train.steps_per_epoch, which the train loop fills in from the
    dataset before building optimizers; 0 (unknown) means constant LR.
    """
    t = cfg.train
    spe = t.steps_per_epoch
    if t.lr_anneal == 1.0 or spe <= 0:
        return optax.constant_schedule(base_lr)
    return lambda count: base_lr / (t.lr_anneal ** (count // spe))


def g_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    return optax.chain(optax.clip_by_global_norm(t.max_grad_norm),
                       optax.adam(lr_schedule(cfg, t.lr_g),
                                  b1=t.adam_b1, b2=t.adam_b2))


def d_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    return optax.chain(optax.clip_by_global_norm(t.max_grad_norm),
                       optax.adam(lr_schedule(cfg, t.lr_d),
                                  b1=t.adam_b1, b2=t.adam_b2))


def am_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AM pre-training: SGD + momentum + clipping (reference deepspeech recipe,
    SURVEY.md §2 'Train: acoustic model')."""
    t = cfg.train
    return optax.chain(optax.clip_by_global_norm(t.max_grad_norm),
                       optax.sgd(lr_schedule(cfg, t.lr_am),
                                 momentum=t.momentum, nesterov=True))
