"""Per-component timing of the AAS train step at the bench configuration
(VERDICT r1 weak #2: "where do the 233 ms go").

Times each stage as its own jitted program (warm, scalar-synced) and the full
fused step, then prints a JSON breakdown.  Components overlap (g_update contains
g_forward, am_forward, ctc, d_forward and all their backward passes), so the
numbers locate the cost, they don't sum to the step time.

Usage:  python scripts/profile_step.py [--batch 64] [--seconds 8] [--trace DIR]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.utils import jax_cache

jax_cache.enable()

from aas_enhancement_tpu.config import (AMConfig, Config, DiscriminatorConfig,
                                        EnhancerConfig, TrainConfig)
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.discriminator import Discriminator
from aas_enhancement_tpu.ops.ctc import ctc_loss_mean
from aas_enhancement_tpu.ops.masking import masked_normalize, time_mask
from aas_enhancement_tpu.train import objectives as obj
from aas_enhancement_tpu.train.loop import init_state
from aas_enhancement_tpu.train.steps import make_train_step
from aas_enhancement_tpu.train.state import d_optimizer, g_optimizer


def timed(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return 1000.0 * (time.perf_counter() - t0) / iters


def _sync(out):
    # Fetch ONE scalar: device_get of a full array would ship megabytes through
    # the remote-execution tunnel and dominate the measurement; and plain
    # block_until_ready does not sync through the tunnel at all.
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", help="jax.profiler trace output dir")
    args = p.parse_args()

    cfg = Config(am=AMConfig(dtype="bfloat16"),
                 enhancer=EnhancerConfig(dtype="bfloat16"),
                 discriminator=DiscriminatorConfig(dtype="bfloat16"),
                 train=TrainConfig(objective="aas", batch_size=args.batch))
    b = args.batch
    sr = cfg.audio.sample_rate
    n = int(sr * args.seconds)
    rng = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1,
        "wav_lengths": jnp.full((b,), n, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 29, size=(b, 48)), jnp.int32),
        "label_paddings": jnp.zeros((b, 48), jnp.float32),
        "clean_wav": jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1,
        "clean_wav_lengths": jnp.full((b,), n, jnp.int32),
    }
    state = init_state(cfg, jax.random.key(0))
    res = {}

    # --- featurization (STFT + log1p) ------------------------------------
    feats = jax.jit(lambda w, l: obj.device_features(cfg, w, l))
    res["features_ms"] = timed(feats, batch["wav"], batch["wav_lengths"],
                               iters=args.iters)
    _, log_mag, fl = feats(batch["wav"], batch["wav_lengths"])

    # --- enhancer forward --------------------------------------------------
    g_fwd = jax.jit(lambda p, w, l: obj.enhancer_forward(cfg, p, w, l))
    res["g_forward_ms"] = timed(g_fwd, state.g_params, batch["wav"],
                                batch["wav_lengths"], iters=args.iters)
    _, enh_log, _ = g_fwd(state.g_params, batch["wav"], batch["wav_lengths"])

    # --- AM forward (frozen teacher) ---------------------------------------
    am = AcousticModel(cfg.am)
    am_in = masked_normalize(enh_log, fl)
    am_fwd = jax.jit(lambda p, x, l: am.apply(p, x, l))
    res["am_forward_ms"] = timed(am_fwd, state.am_params, am_in, fl,
                                 iters=args.iters)
    logits, out_lengths = am_fwd(state.am_params, am_in, fl)
    logit_pads = 1.0 - time_mask(out_lengths, logits.shape[1])

    # --- CTC loss (forward only) -------------------------------------------
    ctc = jax.jit(lambda lg, lp: ctc_loss_mean(lg, lp, batch["labels"],
                                               batch["label_paddings"]))
    res["ctc_forward_ms"] = timed(ctc, logits, logit_pads, iters=args.iters)

    # --- discriminator forward ----------------------------------------------
    disc = Discriminator(cfg.discriminator)
    d_fwd = jax.jit(lambda p, x, l: disc.apply(p, x, l))
    res["d_forward_ms"] = timed(d_fwd, state.d_params, enh_log, fl,
                                iters=args.iters)

    # --- G update (fwd+bwd through G, frozen AM, D + both losses + Adam) ---
    g_optim = g_optimizer(cfg)

    @jax.jit
    def g_update(g_params, g_opt, d_params, am_params, bt):
        def loss_fn(p):
            loss, aux = obj.generator_loss(cfg, p, d_params, am_params, bt,
                                           use_acoustic=True, use_adv=True,
                                           lam=cfg.train.lambda_adv)
            return loss, aux
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, new_opt = g_optim.update(grads, g_opt, g_params)
        return jax.tree.map(lambda a, u: a + u, g_params, updates), new_opt

    res["g_update_ms"] = timed(g_update, state.g_params, state.g_opt,
                               state.d_params, state.am_params, batch,
                               iters=args.iters)

    # --- D update ------------------------------------------------------------
    d_optim = d_optimizer(cfg)
    clean_feats = jax.jit(lambda w, l: obj.device_features(cfg, w, l))
    _, clean_log, clean_fl = clean_feats(batch["clean_wav"],
                                         batch["clean_wav_lengths"])

    @jax.jit
    def d_update(d_params, d_opt):
        def loss_fn(p):
            return obj.discriminator_loss(cfg, p, enh_log, fl, clean_log, clean_fl)
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
        updates, new_opt = d_optim.update(grads, d_opt, d_params)
        return jax.tree.map(lambda a, u: a + u, d_params, updates), new_opt

    res["d_update_ms"] = timed(d_update, state.d_params, state.d_opt,
                               iters=args.iters)

    # --- full fused step -------------------------------------------------------
    step = jax.jit(make_train_step(cfg))
    res["full_step_ms"] = timed(step, state, batch, iters=args.iters)

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = step(state, batch)
            _sync(out)
        res["trace_dir"] = args.trace

    res.update(batch_size=b, seconds=args.seconds,
               utts_per_sec=1000.0 * b / res["full_step_ms"],
               device=str(jax.devices()[0]))
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
