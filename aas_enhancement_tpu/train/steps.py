"""Single-jit train steps, one per objective.

The reference runs each training variant as a Python loop of many GPU kernel launches
(SURVEY.md §3.1/§3.2).  Here each step — including BOTH optimizer updates of the GAN
and the full three-network AAS objective — is ONE XLA-compiled function
(BASELINE.json:5 "one XLA-compiled train step"), with state buffers donated.

Data-parallelism falls out of sharding: these steps contain only batched ops, so
jitting them with batch inputs sharded over the mesh's data axis and state replicated
makes XLA insert the gradient all-reduce collectives automatically (SURVEY.md §2
rebuild obligation #4 — the NCCL-equivalent is GSPMD over ICI, not hand-written comm).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.train import objectives as obj
from aas_enhancement_tpu.train.state import (TrainState, am_optimizer, d_optimizer,
                                             g_optimizer)


def _apply_update(optimizer, grads, params, opt_state):
    updates, new_opt = optimizer.update(grads, opt_state, params)
    return jax.tree.map(lambda p, u: p + u, params, updates), new_opt


def _grad_norm(grads) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                        for g in jax.tree.leaves(grads)))


def make_train_step(cfg: Config) -> Callable:
    """-> step(state, batch_dict) -> (state, metrics).  batch_dict keys: wav,
    wav_lengths, labels, label_paddings, and per-objective: clean_wav (paired) or
    unpaired clean_wav/clean_wav_lengths (adversarial/aas)."""
    objective = cfg.train.objective
    g_opt = g_optimizer(cfg)
    d_opt = d_optimizer(cfg)
    am_opt = am_optimizer(cfg)
    lam = cfg.train.lambda_adv

    def g_update(state: TrainState, loss_fn) -> tuple[TrainState, dict]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.g_params)
        new_params, new_opt = _apply_update(g_opt, grads, state.g_params, state.g_opt)
        aux["g_grad_norm"] = _grad_norm(grads)
        return state.replace(g_params=new_params, g_opt=new_opt), aux

    def d_update(state: TrainState, batch, enh_log, enh_fl) -> tuple[TrainState, dict]:
        # Fake side: the G output already computed for the G update (detached) —
        # matches the reference's enh.detach() and avoids a second G forward.
        _, clean_log, clean_fl = obj.device_features(
            cfg, batch["clean_wav"], batch["clean_wav_lengths"])

        def loss_fn(d_params):
            return obj.discriminator_loss(cfg, d_params, enh_log, enh_fl,
                                          clean_log, clean_fl,
                                          w_fake=batch.get("row_weights"),
                                          w_real=batch.get("clean_row_weights"))

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        new_params, new_opt = _apply_update(d_opt, grads, state.d_params, state.d_opt)
        return state.replace(d_params=new_params, d_opt=new_opt), aux

    def _pop_enh(aux):
        return aux.pop("enh_log"), aux.pop("enh_fl")

    if objective == "paired":
        def step(state: TrainState, batch):
            state, aux = g_update(
                state, lambda p: obj.paired_loss(cfg, p, batch))
            return state.replace(step=state.step + 1), aux

    elif objective == "adversarial":
        def step(state: TrainState, batch):
            state, aux = g_update(
                state, lambda p: obj.generator_loss(
                    cfg, p, state.d_params, {}, batch,
                    use_acoustic=False, use_adv=True, lam=lam))
            enh_log, enh_fl = _pop_enh(aux)
            state, d_aux = d_update(state, batch, enh_log, enh_fl)
            return state.replace(step=state.step + 1), {**aux, **d_aux}

    elif objective == "acoustic":
        def step(state: TrainState, batch):
            state, aux = g_update(
                state, lambda p: obj.generator_loss(
                    cfg, p, {}, state.am_params, batch,
                    use_acoustic=True, use_adv=False, lam=lam))
            _pop_enh(aux)
            return state.replace(step=state.step + 1), aux

    elif objective == "aas":
        def step(state: TrainState, batch):
            state, aux = g_update(
                state, lambda p: obj.generator_loss(
                    cfg, p, state.d_params, state.am_params, batch,
                    use_acoustic=True, use_adv=True, lam=lam))
            enh_log, enh_fl = _pop_enh(aux)
            state, d_aux = d_update(state, batch, enh_log, enh_fl)
            return state.replace(step=state.step + 1), {**aux, **d_aux}

    elif objective == "am":
        def step(state: TrainState, batch):
            def loss_fn(p):
                return obj.am_pretrain_loss(cfg, p, batch)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.am_params)
            new_params, new_opt = _apply_update(am_opt, grads, state.am_params,
                                               state.am_opt)
            aux["am_grad_norm"] = _grad_norm(grads)
            return state.replace(am_params=new_params, am_opt=new_opt,
                                 step=state.step + 1), aux

    else:
        raise ValueError(f"unknown objective: {objective!r}")

    return step
