"""Data-parallel correctness on the 8-virtual-CPU mesh (SURVEY.md §4 item 4):
the pjit/mesh path must match the single-device run bitwise on CPU."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        DiscriminatorConfig, EnhancerConfig,
                                        MeshConfig, TrainConfig)
from aas_enhancement_tpu.parallel.mesh import (make_mesh, pad_batch_to_devices,
                                               replicate_state, shard_batch)
from aas_enhancement_tpu.train.loop import init_state
from aas_enhancement_tpu.train.steps import make_train_step


def _cfg(objective, n_devices, train_overrides=None):
    return Config(
        am=AMConfig(rnn_hidden=16, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=16, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective=objective, batch_size=8,
                          **(train_overrides or {})),
        mesh=MeshConfig(num_devices=n_devices),
    )


def _batch(b=8, n=16000, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "wav_lengths": np.full((b,), n, np.int32),
        "labels": rng.integers(1, 29, size=(b, 8)).astype(np.int32),
        "label_paddings": np.zeros((b, 8), np.float32),
        "clean_wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "clean_wav_lengths": np.full((b,), n, np.int32),
    }


def _run(objective, n_devices, steps=3, train_overrides=None):
    cfg = _cfg(objective, n_devices, train_overrides)
    mesh = make_mesh(cfg.mesh)
    assert len(mesh.devices.ravel()) == n_devices
    state = init_state(cfg, jax.random.key(0))
    state = replicate_state(mesh, state)
    step = jax.jit(make_train_step(cfg))
    batch = pad_batch_to_devices(_batch(), n_devices)
    auxes = []
    with mesh:
        sb = shard_batch(mesh, batch)
        for _ in range(steps):
            state, aux = step(state, sb)
            auxes.append({k: float(v) for k, v in aux.items()})
    return jax.device_get(state), auxes


# Every objective the CLI can launch, plus the blockwise (streaming)
# training variants (VERDICT r4 #4) — GSPMD sharding of the blockwise scans
# must be pinned before any real pod run.  Blockwise variants use a small
# window so the 1-second test utterances split into multiple blocks.
# 0.24 s = 24 input frames at fps=100 — EVEN, as the AM blockwise forward
# requires for exact frame stitching (conv1 time stride 2).
_BLOCKWISE = dict(stream_chunk_s=0.24, stream_lookahead_s=0.1,
                  stream_history_s=0.24)
_MESH_VARIANTS = [
    ("aas", None),
    ("paired", None),
    ("acoustic", None),
    ("adversarial", None),
    ("am", None),
    ("aas-blockwise", dict(streaming_finetune=True, **_BLOCKWISE)),
    ("am-livechain", dict(am_through_enhancer=True, streaming_finetune=True,
                          streaming_finetune_am=True, **_BLOCKWISE)),
]


@pytest.mark.parametrize(
    "variant", [v[0] for v in _MESH_VARIANTS],
    ids=[v[0] for v in _MESH_VARIANTS])
@pytest.mark.slow
def test_8dev_matches_1dev(variant):
    """Same batch, same init: 8-way data parallel tracks the single-device run.

    Step 1 losses must match to reduction-order noise (same params, only the
    cross-device gradient psum ordering differs); later steps run through Adam,
    which amplifies that noise, so the trajectory tolerance is looser.  A sharding
    bug (e.g. only one shard contributing) would blow past both immediately.
    """
    overrides = dict(_MESH_VARIANTS)[variant]
    objective = variant.split("-")[0]
    _, a1 = _run(objective, 1, train_overrides=overrides)
    _, a8 = _run(objective, 8, train_overrides=overrides)
    for k in a1[0]:
        np.testing.assert_allclose(a1[0][k], a8[0][k], rtol=1e-4, atol=1e-5,
                                   err_msg=f"step-1 metric {k} diverged")
    for i in (1, 2):
        for k in a1[i]:
            np.testing.assert_allclose(a1[i][k], a8[i][k], rtol=2e-2, atol=1e-3,
                                       err_msg=f"step-{i + 1} metric {k} diverged")


def test_uneven_batch_padding():
    b = _batch(b=5)
    padded = pad_batch_to_devices(b, 8)
    assert padded["wav"].shape[0] == 8
    np.testing.assert_array_equal(padded["wav"][5], b["wav"][0])


@pytest.mark.slow
def test_grad_accum_on_mesh():
    """grad_accum splits the batch dim into (k, B/k) INSIDE the sharded step —
    the reshape over the data-sharded dim must compile and track the k=1 run."""
    def run(k):
        cfg = _cfg("aas", 8)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, grad_accum=k))
        mesh = make_mesh(cfg.mesh)
        state = init_state(cfg, jax.random.key(0))
        state = replicate_state(mesh, state)
        step = jax.jit(make_train_step(cfg))
        batch = pad_batch_to_devices(_batch(), 8)
        with mesh:
            sb = shard_batch(mesh, batch)
            state, aux = step(state, sb)
        return {kk: float(v) for kk, v in aux.items()}

    a1 = run(1)
    a2 = run(2)
    # k microbatches of equal real-row count: identical losses up to
    # accumulation/reduction order.
    np.testing.assert_allclose(a1["loss_g"], a2["loss_g"], rtol=1e-3)
    np.testing.assert_allclose(a1["loss_d"], a2["loss_d"], rtol=1e-3)


@pytest.mark.slow
def test_multihost_two_process_smoke():
    """VERDICT r2 #4: the multi-host input-sharding branch
    (shard_batch -> make_array_from_process_local_data, replicate_state's
    callback path) must EXECUTE, not just exist: 2 local processes x 4
    virtual CPU devices via jax.distributed, loss trajectory equal to the
    single-process 8-device control run (scripts/multihost_smoke.py)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "multihost_smoke.py")
    r = subprocess.run([sys.executable, script, "--steps", "2"],
                       capture_output=True, text=True, timeout=850)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    assert result["max_rel_loss_diff"] < 1e-4
