"""Checkpoint/resume: restore must continue the loss curve exactly
(SURVEY.md §5 "Checkpoint/resume")."""

import pytest

import jax
import numpy as np

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        EnhancerConfig, TrainConfig)
from aas_enhancement_tpu.data.synthetic import generate_corpus
from aas_enhancement_tpu.train.loop import init_state, train
from aas_enhancement_tpu.utils import checkpoint as ckpt


def _cfg(**kw):
    return Config(
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=16, rnn_layers=1),
        train=TrainConfig(objective="paired", batch_size=4, epochs=100,
                          log_every=1, lr_g=1e-3, **kw),
        data=DataConfig(num_buckets=1),
    )


def test_save_restore_roundtrip(tmp_path):
    cfg = _cfg()
    state = init_state(cfg, jax.random.key(0))
    mgr = ckpt.make_manager(str(tmp_path / "ck"))
    ckpt.save(mgr, 0, jax.device_get(state))
    mgr.wait_until_finished()
    restored = ckpt.restore(mgr, 0, jax.device_get(state))
    mgr.close()
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_continues_loss_curve(tmp_path, tmp_path_factory):
    corpus = generate_corpus(str(tmp_path_factory.mktemp("c")), n_utts=8, seed=3)
    cfg = _cfg(checkpoint_every=4)
    ckdir = str(tmp_path / "ck")

    # Uninterrupted 8-step run.
    _, recs_full = train(cfg, corpus["noisy"], corpus["clean"], paired=True,
                         max_steps=8)

    # 4 steps, checkpoint, then resume for 4 more.
    _, recs_a = train(cfg, corpus["noisy"], corpus["clean"], paired=True,
                      max_steps=4, checkpoint_dir=ckdir)
    _, recs_b = train(cfg, corpus["noisy"], corpus["clean"], paired=True,
                      max_steps=8, checkpoint_dir=ckdir, resume=True)

    full = {r["step"]: r["loss_paired"] for r in recs_full}
    resumed = {r["step"]: r["loss_paired"] for r in recs_b}
    for s in (5, 6, 7, 8):
        assert s in resumed, f"resumed run missing step {s}"
        np.testing.assert_allclose(resumed[s], full[s], rtol=1e-5, atol=1e-6,
                                   err_msg=f"loss curve diverged at step {s}")


@pytest.mark.slow
def test_resume_aas_clean_stream_lockstep(tmp_path, tmp_path_factory):
    """Resume must replay the SAME unpaired clean batches (stream fast-forward)."""
    from aas_enhancement_tpu.config import (AMConfig, DiscriminatorConfig)
    corpus = generate_corpus(str(tmp_path_factory.mktemp("c2")), n_utts=8, seed=5)
    cfg = Config(
        am=AMConfig(rnn_hidden=16, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=16, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective="aas", batch_size=4, epochs=100,
                          log_every=1, checkpoint_every=4),
        data=DataConfig(num_buckets=1),
    )
    ckdir = str(tmp_path / "ck2")
    _, full = train(cfg, corpus["noisy"], corpus["clean"], max_steps=8)
    _, _ = train(cfg, corpus["noisy"], corpus["clean"], max_steps=4,
                 checkpoint_dir=ckdir)
    _, resumed = train(cfg, corpus["noisy"], corpus["clean"], max_steps=8,
                       checkpoint_dir=ckdir, resume=True)
    f = {r["step"]: r["loss_d"] for r in full}
    r = {r["step"]: r["loss_d"] for r in resumed}
    for s in (5, 6, 7, 8):
        np.testing.assert_allclose(r[s], f[s], rtol=1e-5, atol=1e-6,
                                   err_msg=f"D loss diverged at step {s} "
                                           "(clean stream out of lockstep)")


def test_restore_rehosted_ignores_saved_shardings(tmp_path):
    """restore_rehosted must open a checkpoint whose arrays were saved with
    device shardings that don't exist at restore time (train on TPU ->
    evaluate on CPU).  Simulated here by saving state replicated over the
    8-device test mesh and restoring template-less onto one local device:
    only shape/dtype metadata may be consulted, never the saved sharding."""
    cfg = _cfg()
    state = init_state(cfg, jax.random.key(0))
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("dp",))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    sharded = jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state)
    mgr = ckpt.make_manager(str(tmp_path / "ck"))
    ckpt.save(mgr, 3, {"step": sharded.step, "g_params": sharded.g_params})
    mgr.wait_until_finished()
    raw = ckpt.restore_rehosted(mgr, 3)
    mgr.close()
    assert int(raw["step"]) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(raw["g_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert len(b.devices()) == 1
