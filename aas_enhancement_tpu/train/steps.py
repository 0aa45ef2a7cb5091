"""Single-jit train steps, one per objective.

The reference runs each training variant as a Python loop of many GPU kernel launches
(SURVEY.md §3.1/§3.2).  Here each step — including BOTH optimizer updates of the GAN
and the full three-network AAS objective — is ONE XLA-compiled function
(BASELINE.json:5 "one XLA-compiled train step"), with state buffers donated.

Data-parallelism falls out of sharding: these steps contain only batched ops, so
jitting them with batch inputs sharded over the mesh's data axis and state replicated
makes XLA insert the gradient all-reduce collectives automatically (SURVEY.md §2
rebuild obligation #4 — the NCCL-equivalent is GSPMD over ICI, not hand-written comm).

Gradient accumulation (TrainConfig.grad_accum = k > 1): the global batch is split
into k microbatches scanned inside the SAME jitted step; gradients (and the GAN's
G and D gradients together) average across microbatches before the single optimizer
update.  Peak activation memory scales with batch/k, so effective batches beyond
the Pallas kernels' VMEM ceiling (B=256+ on v5e) stay one XLA program.  Each
microbatch loss divides by its SHARE of the global real-row weight (W_total / k,
computed on the full batch before splitting, per weight stream — noisy rows and
the unpaired clean rows separately), so the averaged gradients and metrics equal
the unaccumulated weighted batch mean EXACTLY even when real rows are spread
unevenly across microbatches (a bucket's final short batch; all-padding
microbatches contribute zero weight and zero gradient).
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


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_scale(a, s: float):
    return jax.tree.map(lambda x: x * s, a)


def make_train_step(cfg: Config, anchor_am_params=None) -> Callable:
    """-> step(state, batch_dict) -> (state, metrics).  batch_dict keys: wav,
    wav_lengths, labels, label_paddings, and per-objective: clean_wav (paired) or
    unpaired clean_wav/clean_wav_lengths (adversarial/aas).

    `anchor_am_params`: frozen base-AM params for the "am" objective's
    posterior-anchor distillation (TrainConfig.distill_lambda; VERDICT r4
    #1c) — captured as a closure constant, never updated."""
    objective = cfg.train.objective
    g_opt = g_optimizer(cfg)
    d_opt = d_optimizer(cfg)
    am_opt = am_optimizer(cfg)
    lam = cfg.train.lambda_adv
    k = max(1, cfg.train.grad_accum)
    if cfg.train.batch_size % k:
        raise ValueError(f"batch_size {cfg.train.batch_size} not divisible by "
                         f"grad_accum {k}")

    # ---------------------------------------------------------------- grads
    # One microbatch's gradients for every network the objective trains, plus
    # scalar metrics.  The structure (which nets appear) is objective-static.
    # wd / cwd: fixed weighted-mean denominators (the microbatch's SHARE of the
    # global real-row count for the noisy / unpaired-clean streams) — None on
    # the unaccumulated (k == 1) path, where sum(weights) is the denominator.
    def micro_grads(state: TrainState, mb, wd=None, cwd=None) -> tuple[dict, dict]:
        if objective == "am":
            # Per-step SpecAugment key: fold the step counter into the state
            # rng (no state mutation -> checkpoint resume stays exact).
            rng = (jax.random.fold_in(state.rng, state.step)
                   if cfg.train.spec_augment else None)
            gp = state.g_params if cfg.train.am_through_enhancer else None
            (_, aux), g = jax.value_and_grad(
                lambda p: obj.am_pretrain_loss(cfg, p, mb, w_denom=wd,
                                               rng=rng, g_params=gp,
                                               anchor_am_params=anchor_am_params),
                has_aux=True)(state.am_params)
            return {"am": g}, aux

        if objective == "paired":
            (_, aux), g = jax.value_and_grad(
                lambda p: obj.paired_loss(cfg, p, mb, w_denom=wd),
                has_aux=True)(state.g_params)
            return {"g": g}, aux

        if objective == "acoustic":
            (_, aux), g = jax.value_and_grad(
                lambda p: obj.generator_loss(cfg, p, {}, state.am_params, mb,
                                             use_acoustic=True, use_adv=False,
                                             lam=lam, w_denom=wd),
                has_aux=True)(state.g_params)
            aux.pop("enh_log"), aux.pop("enh_fl")
            return {"g": g}, aux

        if objective in ("adversarial", "aas"):
            use_ac = objective == "aas"
            (_, aux), g = jax.value_and_grad(
                lambda p: obj.generator_loss(
                    cfg, p, state.d_params,
                    state.am_params if use_ac else {}, mb,
                    use_acoustic=use_ac, use_adv=True, lam=lam, w_denom=wd),
                has_aux=True)(state.g_params)
            # Fake side: the G output already computed for the G update
            # (detached) — matches the reference's enh.detach() and avoids a
            # second G forward.
            enh_log, enh_fl = aux.pop("enh_log"), aux.pop("enh_fl")
            _, clean_log, clean_fl = obj.device_features(
                cfg, mb["clean_wav"], mb["clean_wav_lengths"])
            (_, d_aux), dg = jax.value_and_grad(
                lambda p: obj.discriminator_loss(
                    cfg, p, enh_log, enh_fl, clean_log, clean_fl,
                    w_fake=mb.get("row_weights"),
                    w_real=mb.get("clean_row_weights"),
                    fake_denom=wd, real_denom=cwd), has_aux=True)(
                    state.d_params)
            return {"g": g, "d": dg}, {**aux, **d_aux}

        raise ValueError(f"unknown objective: {objective!r}")

    def _share(batch, w_key: str, rows_key: str):
        """Global real-row weight of one stream, divided by k (each microbatch
        divides by this share; the final 1/k average then reproduces the exact
        full-batch weighted mean)."""
        w = batch.get(w_key)
        total = (jnp.sum(w.astype(jnp.float32)) if w is not None
                 else jnp.float32(batch[rows_key].shape[0]))
        return total / k

    # Microbatch i takes the STRIDED rows {r : r % k == i}, not a contiguous
    # block: under the data-axis sharding each device owns a contiguous row
    # block, so a contiguous microbatch would live entirely on ONE device and
    # GSPMD would insert collective-permutes to spread it back out (measured:
    # it does, and XLA:CPU's 40 s collective rendezvous then times out on the
    # virtual mesh).  Strided rows keep every microbatch evenly sharded — the
    # scan needs no communication at all.  The exact share-denominator
    # weighting above is assignment-agnostic, so this is purely a layout
    # decision.
    def select_micro(batch, i):
        return jax.tree.map(
            lambda v: jax.lax.dynamic_index_in_dim(
                v.reshape((v.shape[0] // k, k) + v.shape[1:]), i, axis=1,
                keepdims=False), batch)

    def batch_grads(state: TrainState, batch) -> tuple[dict, dict]:
        if k == 1:
            return micro_grads(state, batch)
        wd = _share(batch, "row_weights", "wav")
        cwd = (_share(batch, "clean_row_weights", "clean_wav")
               if "clean_wav" in batch else None)
        init = micro_grads(state, select_micro(batch, 0), wd, cwd)

        def body(carry, i):
            g, a = micro_grads(state, select_micro(batch, i), wd, cwd)
            return (_tree_add(carry[0], g), _tree_add(carry[1], a)), None

        (grads, aux), _ = jax.lax.scan(body, init,
                                       jnp.arange(1, k, dtype=jnp.int32))
        return _tree_scale(grads, 1.0 / k), _tree_scale(aux, 1.0 / k)

    # ---------------------------------------------------------------- step
    def step(state: TrainState, batch):
        grads, aux = batch_grads(state, batch)
        if "g" in grads:
            new_params, new_opt = _apply_update(g_opt, grads["g"],
                                                state.g_params, state.g_opt)
            state = state.replace(g_params=new_params, g_opt=new_opt)
            aux["g_grad_norm"] = _grad_norm(grads["g"])
        if "d" in grads:
            new_params, new_opt = _apply_update(d_opt, grads["d"],
                                                state.d_params, state.d_opt)
            state = state.replace(d_params=new_params, d_opt=new_opt)
        if "am" in grads:
            new_params, new_opt = _apply_update(am_opt, grads["am"],
                                                state.am_params, state.am_opt)
            state = state.replace(am_params=new_params, am_opt=new_opt)
            aux["am_grad_norm"] = _grad_norm(grads["am"])
        return state.replace(step=state.step + 1), aux

    # Exposed for tests: grad-accum equivalence is asserted on gradients (the
    # post-Adam params amplify near-zero rounding by up to lr per element).
    step.batch_grads = batch_grads
    return step
