"""Generic training loop: dataset streaming, sharded single-jit steps, checkpoints.

Reference capability: the per-experiment train scripts (SURVEY.md §2 "Train: *",
§3.1-§3.2) — epochs over bucketed batches, per-iter loss logging, epoch checkpoints,
`--continue_from` resume.  TPU-native: batches are device_put with the data axis
sharded over the mesh, the step function is jitted once per bucket shape, and Orbax
handles async checkpointing.
"""

from __future__ import annotations

import math
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.data.dataset import AudioDataset, UnpairedCleanStream
from aas_enhancement_tpu.enhance import init_enhancer
from aas_enhancement_tpu.models.am import AcousticModel
from aas_enhancement_tpu.models.discriminator import Discriminator
from aas_enhancement_tpu.parallel.mesh import (make_mesh, pad_batch_to_devices,
                                               replicate_state, shard_batch)
from aas_enhancement_tpu.train.state import (TrainState, am_optimizer, d_optimizer,
                                             g_optimizer)
from aas_enhancement_tpu.train.steps import make_train_step
from aas_enhancement_tpu.utils.metrics import MetricsLogger


def init_state(cfg: Config, rng: jax.Array, am_params=None) -> TrainState:
    """Initialize exactly the networks the objective needs."""
    objective = cfg.train.objective
    r_g, r_d, r_am = jax.random.split(rng, 3)
    f = cfg.audio.num_bins
    x = jnp.zeros((1, 64, f), jnp.float32)
    lengths = jnp.array([64], jnp.int32)

    kw = {}
    if objective in ("paired", "adversarial", "acoustic", "aas", "enhance_only"):
        g_params = init_enhancer(cfg, r_g)
        kw["g_params"] = g_params
        kw["g_opt"] = g_optimizer(cfg).init(g_params)
    if objective in ("adversarial", "aas"):
        d_params = Discriminator(cfg.discriminator).init(r_d, x, lengths)
        kw["d_params"] = d_params
        kw["d_opt"] = d_optimizer(cfg).init(d_params)
    if objective in ("acoustic", "aas"):
        if am_params is None:
            am_params = AcousticModel(cfg.am).init(r_am, x, lengths)
        kw["am_params"] = am_params
    if objective == "am":
        if am_params is None:
            am_params = AcousticModel(cfg.am).init(r_am, x, lengths)
        kw["am_params"] = am_params
        kw["am_opt"] = am_optimizer(cfg).init(am_params)
        if cfg.train.am_through_enhancer:
            # Frozen-G feature source (TrainConfig.am_through_enhancer);
            # callers graft trained enhancer weights over this init.
            kw["g_params"] = init_enhancer(cfg, r_g)

    return TrainState(step=jnp.zeros((), jnp.int32), rng=rng, **kw)


def load_state(checkpoint_dir: str) -> tuple[TrainState, Config]:
    """Load network parameters from a training checkpoint dir (cross-run use:
    evaluate / enhance / frozen-AM handoff).

    Restores the raw saved pytree (no structure template — robust to optimizer
    or RNG representation differences across code versions) and grafts the
    parameter fields onto a fresh TrainState.  Optimizer states are NOT carried
    over; in-run resume (`train(..., resume=True)`) uses the exact-structure
    template path instead.
    """
    import os

    from aas_enhancement_tpu.utils import checkpoint as ckpt

    cfg_path = os.path.join(checkpoint_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"{checkpoint_dir}: no config.json — not a train-CLI checkpoint dir")
    cfg = Config.from_json(open(cfg_path).read())

    mgr = ckpt.make_manager(checkpoint_dir)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {checkpoint_dir}")
    raw = ckpt.restore_rehosted(mgr, step)
    mgr.close()

    state = init_state(cfg, jax.random.key(0))
    state = state.replace(
        step=jnp.asarray(raw.get("step", step), jnp.int32),
        g_params=raw.get("g_params") or {},
        d_params=raw.get("d_params") or {},
        am_params=raw.get("am_params") or {},
    )
    return state, cfg


class _Validator:
    """In-training validation: greedy-decode WER on cfg.data.val_manifest.

    Reference parity: SURVEY.md §3.1 "eval epoch: greedy decode -> WER" and §3.2
    "periodic: enhance dev set -> AM decode -> WER".  The decode AM is the state's
    own (am/acoustic/aas) or a decode-only `eval_am_params` (paired/adversarial).
    Keeps best-WER checkpoint selection in `<checkpoint_dir>/best_ckpt`.
    """

    def __init__(self, cfg: Config, eval_am_params, records, logger,
                 checkpoint_dir: str | None):
        from aas_enhancement_tpu.evaluation import eval_dataset, make_eval_forward

        self.cfg = cfg
        self.eval_am_params = eval_am_params
        self.records = records
        self.logger = logger
        self.checkpoint_dir = checkpoint_dir
        self.ds = eval_dataset(cfg, cfg.data.val_manifest)
        self.use_enhancer = cfg.train.objective != "am"
        self.forward = make_eval_forward(cfg, use_enhancer=self.use_enhancer)
        self._noisy_forward = None
        self.noisy_wer = None          # frozen-AM baseline, computed once
        self.best_wer = float("inf")
        self.last_eval_step = -1
        self._best_mgr = None

    def _am_params(self, state: TrainState):
        if state.am_params:
            return state.am_params
        return self.eval_am_params

    def run(self, state: TrainState, s: int, epoch: int) -> dict | None:
        from aas_enhancement_tpu.evaluation import evaluate_wer, make_eval_forward

        self.last_eval_step = s
        am_p = self._am_params(state)
        if not am_p:
            return None   # paired/adversarial without a decode-only AM
        g_p = state.g_params if self.use_enhancer else None
        res = evaluate_wer(self.cfg, am_p, self.ds, g_params=g_p,
                           batch_size=self.cfg.train.eval_batch_size,
                           forward=self.forward)
        rec = {"step": s, "epoch": epoch,
               "val_wer": res["wer"], "val_cer": res["cer"]}
        if self.use_enhancer and self.cfg.train.objective != "paired":
            # The decode AM is frozen for these objectives, so the noisy-input
            # baseline is constant: compute it once, log it with every eval.
            if self.noisy_wer is None:
                if self._noisy_forward is None:
                    self._noisy_forward = make_eval_forward(self.cfg,
                                                            use_enhancer=False)
                self.noisy_wer = evaluate_wer(
                    self.cfg, am_p, self.ds,
                    batch_size=self.cfg.train.eval_batch_size,
                    forward=self._noisy_forward)["wer"]
            rec["val_wer_noisy"] = self.noisy_wer
        self.records.append(rec)
        self.logger.log(s, **{k: v for k, v in rec.items() if k != "step"})

        if res["wer"] < self.best_wer:
            self.best_wer = res["wer"]
            if self.checkpoint_dir:
                import json

                from aas_enhancement_tpu.utils import checkpoint as ckpt
                if self._best_mgr is None:
                    self._best_mgr = ckpt.make_manager(
                        os.path.join(self.checkpoint_dir, "best_ckpt"),
                        max_to_keep=1)
                ckpt.save(self._best_mgr, s, jax.device_get(state))
                with open(os.path.join(self.checkpoint_dir, "best.json"), "w") as f:
                    json.dump({"step": s, "val_wer": res["wer"],
                               "val_cer": res["cer"]}, f)
        return rec

    def close(self) -> None:
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()
            self._best_mgr.close()


def _prefetched(gen, depth: int):
    """Run `gen` in a producer thread, `depth` items ahead of the consumer.

    Overlaps host batch assembly AND host->device transfer with device compute
    (the producer yields ALREADY-SHARDED device batches).  depth <= 0 degrades
    to synchronous iteration.  The producer is a single thread, so the data
    order (incl. the clean stream's RNG draws) is identical to the synchronous
    path.  Early consumer exit (max_steps) signals the producer to stop.
    """
    if depth <= 0:
        yield from gen
        return
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    end = object()
    stop = threading.Event()
    err: list[BaseException] = []

    def worker():
        try:
            for item in gen:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:   # propagate into the consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(end, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True, name="aas-input-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is end:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def _batch_dict(cfg: Config, batch, clean_stream: UnpairedCleanStream | None):
    d = {"wav": batch.wav, "wav_lengths": batch.wav_lengths,
         "labels": batch.labels, "label_paddings": batch.label_paddings}
    objective = cfg.train.objective
    if objective == "paired":
        if batch.clean_wav is None:
            raise ValueError("paired objective needs a paired clean manifest")
        d["clean_wav"] = batch.clean_wav
    if objective in ("adversarial", "aas"):
        if clean_stream is None:
            raise ValueError(f"{objective} objective needs an unpaired clean manifest")
        cb = clean_stream.next_batch(batch.wav.shape[1])
        d["clean_wav"] = cb.wav
        d["clean_wav_lengths"] = cb.wav_lengths
    return d


def train(cfg: Config, noisy_manifest: str, clean_manifest: str | None = None,
          paired: bool = False, max_steps: int = 0,
          metrics_path: str | None = None,
          tensorboard_dir: str | None = None,
          checkpoint_dir: str | None = None,
          resume: bool = False,
          state: TrainState | None = None,
          step_fn: Callable | None = None,
          eval_am_params=None) -> tuple[TrainState, list[dict]]:
    """Run cfg.train.objective.  Returns (final_state, metric records).

    When cfg.data.val_manifest is set, validation (greedy-decode WER through the
    available AM — SURVEY.md §3.1/§3.2 "eval epoch" / "periodic ... dev set ->
    AM decode -> WER") runs every cfg.train.eval_every steps (0 = each epoch
    end), logs val_wer/val_cer, and keeps best-WER checkpoint selection.
    `eval_am_params` supplies a decode-only AM for objectives that train without
    one (paired/adversarial).
    """
    import dataclasses

    mesh = make_mesh(cfg.mesh)
    n_dev = len(mesh.devices.ravel())

    ds = AudioDataset(noisy_manifest, cfg.audio, cfg.data,
                      paired_manifest=clean_manifest if paired else None)
    # The LR schedule anneals per epoch; fill in the dataset-derived epoch
    # length before optimizers/steps are built (train/state.lr_schedule).
    if cfg.train.steps_per_epoch == 0:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, steps_per_epoch=ds.num_batches(cfg.train.batch_size)))
    clean_stream = None
    if cfg.train.objective in ("adversarial", "aas"):
        clean_ds = AudioDataset(clean_manifest, cfg.audio, cfg.data)
        clean_stream = UnpairedCleanStream(clean_ds, cfg.train.batch_size,
                                           seed=cfg.train.seed + 1)

    if state is None:
        state = init_state(cfg, jax.random.key(cfg.train.seed))

    mgr = None
    if checkpoint_dir:
        from aas_enhancement_tpu.utils import checkpoint as ckpt
        mgr = ckpt.make_manager(checkpoint_dir)
        if resume and mgr.latest_step() is not None:
            state = ckpt.restore(mgr, mgr.latest_step(), state)

    anchor_am = None
    if (cfg.train.objective == "am" and cfg.train.distill_lambda > 0.0
            and step_fn is None):
        # Posterior-anchor distillation (TrainConfig.distill_lambda): the
        # anchor is the AM exactly as this run STARTED — adaptation pulls
        # away from it only where CTC demands (VERDICT r4 #1c).  Resume of a
        # distill run re-anchors at the restored params; adaptation runs are
        # short one-shot jobs, so this is the intended semantics.
        anchor_am = jax.device_get(state.am_params)

    state = replicate_state(mesh, state)
    step = step_fn or make_train_step(cfg, anchor_am_params=anchor_am)
    step = jax.jit(step, donate_argnums=(0,))

    logger = MetricsLogger(metrics_path, tensorboard_dir=tensorboard_dir)
    records = []
    t_last = time.perf_counter()
    done = False

    # Resume fast-forwards the deterministic data stream to the checkpointed
    # position (batch count per epoch is order-shuffled but size-stable), so the
    # loss curve continues exactly (SURVEY.md §5 "Checkpoint/resume").
    steps_done = int(state.step)
    steps_per_epoch = ds.num_batches(cfg.train.batch_size)
    start_epoch = steps_done // steps_per_epoch
    skip = steps_done % steps_per_epoch
    if clean_stream is not None:
        # The clean stream is per-STEP (not per-epoch): fast-forward its RNG by
        # every step already taken so resumed runs see the same real-side batches.
        for _ in range(steps_done):
            clean_stream.skip()

    if cfg.data.use_grain:
        from aas_enhancement_tpu.data.grain_loader import grain_batches

        def epoch_batches(epoch, start=0):
            return grain_batches(ds, cfg.train.batch_size, cfg.train.seed, epoch,
                                 worker_count=cfg.data.grain_workers,
                                 sorted_order=cfg.train.sortagrad and epoch == 0,
                                 start=start)
    else:
        def epoch_batches(epoch, start=0):
            return ds.batches(cfg.train.batch_size, cfg.train.seed, epoch,
                              sorted_order=cfg.train.sortagrad and epoch == 0,
                              start=start)

    # ------------------------------------------------------------- validation
    validator = None
    if cfg.data.val_manifest:
        validator = _Validator(cfg, eval_am_params=eval_am_params,
                               records=records, logger=logger,
                               checkpoint_dir=checkpoint_dir)

    # Rows must split evenly over devices AND over grad_accum microbatches
    # (the step reshapes the PADDED batch into k microbatches), so pad to a
    # multiple of lcm(n_dev, k) — covers short final bucket batches too.
    k_accum = max(1, cfg.train.grad_accum)
    pad_mult = n_dev * k_accum // math.gcd(n_dev, k_accum)

    def prepared_batches(epoch: int, offset: int):
        """Assemble, pad, weight, and device_put each batch (producer side)."""
        for i, batch in enumerate(epoch_batches(epoch, start=offset), start=offset):
            bd = _batch_dict(cfg, batch, clean_stream)
            bd = pad_batch_to_devices(bd, pad_mult)
            # Zero-weight repeat-padded rows (short final bucket batches and
            # device-divisibility padding) so they carry no gradient.
            pb = bd["wav"].shape[0]
            rw = np.zeros(pb, np.float32)
            rw[: batch.size] = 1.0
            bd["row_weights"] = rw
            if "clean_wav" in bd:
                cw = np.zeros(pb, np.float32)
                cw[: cfg.train.batch_size if cfg.train.objective != "paired"
                   else batch.size] = 1.0
                bd["clean_row_weights"] = cw
            yield i, shard_batch(mesh, bd)

    # Throughput baseline = the step count THIS process started from, so the
    # first log after a checkpoint resume divides by the steps actually run
    # here (not by the whole resumed step count).
    last_logged = steps_done
    profiling = False
    profile_done = False
    profile_stop_at = 0
    with mesh:
        for epoch in range(start_epoch, cfg.train.epochs):
            if done:
                break
            offset = skip if epoch == start_epoch else 0
            for i, bd in _prefetched(prepared_batches(epoch, offset),
                                     cfg.train.prefetch):
                state, aux = step(state, bd)

                s = int(state.step)
                # In-training profiler capture (SURVEY.md §5 "Tracing/
                # profiling"): trace a few steady-state steps into XProf/
                # Perfetto format.  int(state.step) above already syncs, so
                # the window brackets whole steps.
                if cfg.train.profile_dir and not profile_done:
                    if not profiling and s >= cfg.train.profile_start:
                        # Start at the FIRST step past the threshold (works
                        # under resume too) and trace the next profile_steps.
                        jax.profiler.start_trace(cfg.train.profile_dir)
                        profiling = True
                        profile_stop_at = s + cfg.train.profile_steps
                    elif profiling and s >= profile_stop_at:
                        jax.profiler.stop_trace()
                        profiling = False
                        profile_done = True
                is_last = (max_steps and s >= max_steps) or (
                    epoch == cfg.train.epochs - 1
                    and i == cfg.train.steps_per_epoch - 1)
                if s % cfg.train.log_every == 0 or s == 1 or is_last:
                    aux = {k: float(v) for k, v in aux.items()}
                    now = time.perf_counter()
                    utts_sec = (cfg.train.batch_size * (s - last_logged)
                                / max(now - t_last, 1e-9)
                                if s > last_logged + 1 else 0.0)
                    t_last = now
                    rec = {"step": s, "epoch": epoch, "utts_per_sec": utts_sec, **aux}
                    records.append(rec)
                    logger.log(s, **{k: v for k, v in rec.items() if k != "step"})
                    last_logged = s
                if mgr and s % cfg.train.checkpoint_every == 0:
                    from aas_enhancement_tpu.utils import checkpoint as ckpt
                    ckpt.save(mgr, s, jax.device_get(state))
                if validator and cfg.train.eval_every and s % cfg.train.eval_every == 0:
                    validator.run(state, s, epoch)
                if max_steps and s >= max_steps:
                    done = True
                    break
            if validator and not cfg.train.eval_every:
                validator.run(state, int(state.step), epoch)

    if validator:
        if int(state.step) != validator.last_eval_step:
            validator.run(state, int(state.step), cfg.train.epochs - 1)
        validator.close()
    if mgr:
        from aas_enhancement_tpu.utils import checkpoint as ckpt
        ckpt.save(mgr, int(state.step), jax.device_get(state))
        mgr.wait_until_finished()
        mgr.close()
    if profiling:   # training ended inside the trace window
        jax.profiler.stop_trace()
    logger.close()
    return jax.device_get(state), records
