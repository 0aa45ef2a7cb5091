"""Integration: short overfit runs per objective on synthetic data
(SURVEY.md §4 item 3 — loss-goes-down assertions, not WER)."""

import dataclasses

import numpy as np
import pytest

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        DiscriminatorConfig, EnhancerConfig,
                                        TrainConfig)
from aas_enhancement_tpu.data.synthetic import generate_corpus
from aas_enhancement_tpu.train.loop import train


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return generate_corpus(str(d), n_utts=8, seed=11, vocab_chars=6)


def _tiny_cfg(objective, **train_kw):
    return Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=24, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective=objective, batch_size=4, epochs=100,
                          log_every=1, lr_g=2e-3, lr_d=2e-3, lr_am=2e-3,
                          **train_kw),
        data=DataConfig(num_buckets=1),
    )


def _first_last(records, key, k=3):
    vals = [r[key] for r in records if key in r]
    assert len(vals) >= 6, f"too few records with {key}"
    return float(np.mean(vals[:k])), float(np.mean(vals[-k:]))


@pytest.mark.slow
def test_paired_loss_decreases(corpus):
    cfg = _tiny_cfg("paired")
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], paired=True, max_steps=16)
    first, last = _first_last(recs, "loss_paired")
    assert last < first, f"paired loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_adversarial_losses_move(corpus):
    cfg = _tiny_cfg("adversarial")
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=16)
    d_first, d_last = _first_last(recs, "loss_d")
    assert d_last < d_first, f"D loss did not decrease: {d_first} -> {d_last}"
    # G is being scored; its loss must stay finite and non-degenerate.
    assert all(np.isfinite(r["loss_adv_g"]) for r in recs)


@pytest.mark.slow
def test_acoustic_ctc_decreases(corpus):
    cfg = _tiny_cfg("acoustic")
    _, recs = train(cfg, corpus["noisy"], max_steps=16)
    first, last = _first_last(recs, "loss_ctc")
    assert last < first, f"CTC loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_aas_joint_decreases(corpus):
    cfg = _tiny_cfg("aas", lambda_adv=0.5)
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=16)
    first, last = _first_last(recs, "loss_g")
    assert last < first, f"joint G loss did not decrease: {first} -> {last}"
    assert all(np.isfinite(r["loss_d"]) for r in recs)


@pytest.mark.slow
def test_am_pretrain_decreases(corpus):
    cfg = _tiny_cfg("am")
    _, recs = train(cfg, corpus["clean"], max_steps=16)
    first, last = _first_last(recs, "loss_ctc_am")
    assert last < first, f"AM CTC loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_frozen_am_unchanged_during_acoustic(corpus):
    """SURVEY.md §4 item 2: the frozen AM must not move during G training."""
    import jax
    cfg = _tiny_cfg("acoustic")
    from aas_enhancement_tpu.train.loop import init_state
    state0 = init_state(cfg, jax.random.key(0))
    am_before = jax.device_get(state0.am_params)
    state, _ = train(cfg, corpus["noisy"], max_steps=6, state=state0)
    am_after = jax.device_get(state.am_params)
    for a, b in zip(jax.tree.leaves(am_before), jax.tree.leaves(am_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_prefetch_matches_synchronous(corpus):
    """The producer-thread input path (TrainConfig.prefetch) must be bit-exact
    with synchronous iteration: same batches, same order, same losses."""
    recs_by_depth = []
    for depth in (0, 2):
        cfg = _tiny_cfg("aas", prefetch=depth)
        _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=6)
        recs_by_depth.append([(r["step"], r["loss_g"], r["loss_d"])
                              for r in recs if "loss_g" in r])
    assert recs_by_depth[0] == recs_by_depth[1]


@pytest.mark.slow
def test_prefetch_early_exit_no_thread_leak(corpus):
    """max_steps exits mid-epoch; the producer thread must wind down.

    slow: the jitted paired step + the 5 s thread-drain poll put this at
    ~60 s — the heaviest single test in the fast tier before it was moved
    (round-5 tier rebalance, VERDICT r4 #7: keep the fast tier <10 min).
    """
    import threading
    import time as _time

    cfg = _tiny_cfg("paired", prefetch=2)
    train(cfg, corpus["noisy"], corpus["clean"], paired=True, max_steps=2)
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        if not any(t.name == "aas-input-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            return
        _time.sleep(0.1)
    raise AssertionError("prefetch producer thread still alive 5 s after train()")


@pytest.mark.slow
def test_grad_accum_matches_full_batch(corpus):
    """k microbatches of equal real-row count average to the full-batch
    gradient, so 10 steps with grad_accum=2 track 10 full-batch steps
    closely (identical data order, same optimizer)."""
    import jax

    from aas_enhancement_tpu.train.loop import init_state
    from aas_enhancement_tpu.train.steps import make_train_step

    losses = {}
    for k in (1, 2):
        cfg = _tiny_cfg("aas", grad_accum=k)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, steps_per_epoch=2))
        state = init_state(cfg, jax.random.key(0))
        step = jax.jit(make_train_step(cfg))
        import numpy as np_
        rng = np_.random.default_rng(0)
        b, n = 4, 16000
        batch = {
            "wav": rng.standard_normal((b, n)).astype(np_.float32) * 0.1,
            "wav_lengths": np_.full((b,), n, np_.int32),
            "labels": rng.integers(1, 7, size=(b, 8)).astype(np_.int32),
            "label_paddings": np_.zeros((b, 8), np_.float32),
            "clean_wav": rng.standard_normal((b, n)).astype(np_.float32) * 0.1,
            "clean_wav_lengths": np_.full((b,), n, np_.int32),
        }
        series = []
        for _ in range(6):
            state, aux = step(state, batch)
            series.append(float(aux["loss_g"]))
        losses[k] = series
    # Full batch vs 2 microbatches: gradients equal up to microbatch-mean
    # composition (equal real rows here), so the loss curves stay close.
    diff = max(abs(a - b) for a, b in zip(losses[1], losses[2]))
    rel = diff / max(abs(x) for x in losses[1])
    assert rel < 2e-2, f"grad_accum diverged: {losses[1]} vs {losses[2]}"


@pytest.mark.slow
def test_grad_accum_uneven_real_rows_exact(corpus):
    """VERDICT r2 #7: with repeat-padded (zero-weight) rows spread UNEVENLY
    across microbatches, accumulated gradients and metrics must equal the
    unaccumulated weighted batch exactly (share-denominator accumulation in
    train/steps.py, not equal-weight microbatch means)."""
    import jax

    from aas_enhancement_tpu.train.loop import init_state
    from aas_enhancement_tpu.train.steps import make_train_step

    rng = np.random.default_rng(3)
    b, n = 4, 16000
    batch = {
        "wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "wav_lengths": np.full((b,), n, np.int32),
        "labels": rng.integers(1, 7, size=(b, 8)).astype(np.int32),
        "label_paddings": np.zeros((b, 8), np.float32),
        "clean_wav": rng.standard_normal((b, n)).astype(np.float32) * 0.1,
        "clean_wav_lengths": np.full((b,), n, np.int32),
        # k=2 splits rows [0,1] / [2,3]: noisy stream has 2 vs 1 real rows,
        # clean stream 1 vs 2 — both weight streams uneven, and differently.
        "row_weights": np.array([1, 1, 1, 0], np.float32),
        "clean_row_weights": np.array([1, 0, 1, 1], np.float32),
    }
    results = {}
    for k in (1, 2):
        cfg = _tiny_cfg("aas", grad_accum=k)
        state = init_state(cfg, jax.random.key(0))
        step = make_train_step(cfg)
        grads, aux = jax.jit(step.batch_grads)(state, batch)
        results[k] = (jax.device_get(grads), {kk: float(v)
                                              for kk, v in aux.items()})
    g1, a1 = results[1]
    g2, a2 = results[2]
    for key in ("loss_g", "loss_ctc", "loss_adv_g", "loss_d",
                "d_score_real", "d_score_fake"):
        assert a1[key] == pytest.approx(a2[key], rel=1e-5, abs=1e-6), (
            f"{key}: k=1 {a1[key]} vs k=2 {a2[key]}")
    # atol covers f32 catastrophic cancellation on near-zero elements (the
    # summand magnitudes are ~1e-2, so ~1e-6 absolute noise is rounding).
    for p1, p2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-4, atol=5e-6)


def test_grad_accum_batch_size_validation():
    from aas_enhancement_tpu.train.steps import make_train_step

    cfg = _tiny_cfg("am", grad_accum=3)  # batch_size=4 not divisible
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(cfg)


@pytest.mark.slow
def test_profile_capture(corpus, tmp_path):
    """TrainConfig.profile_dir captures an XProf trace of a few steps (and the
    early-exit path closes the trace cleanly)."""
    import os

    d = str(tmp_path / "trace")
    cfg = _tiny_cfg("paired", profile_dir=d, profile_start=2, profile_steps=2)
    train(cfg, corpus["noisy"], corpus["clean"], paired=True, max_steps=5)
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert any(f.endswith(".xplane.pb") or f.endswith(".trace.json.gz")
               for f in files), f"no trace artifacts under {d}: {files}"


@pytest.mark.slow
def test_mrstft_paired_loss_decreases(corpus):
    """Paired objective with the multi-resolution STFT auxiliary term trains."""
    cfg = _tiny_cfg("paired", lambda_mrstft=0.5)
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], paired=True,
                    max_steps=12)
    mr = [r["loss_mrstft"] for r in recs if "loss_mrstft" in r]
    assert len(mr) >= 6 and all(np.isfinite(v) for v in mr)
    first, last = _first_last(recs, "loss_paired_total")
    assert last < first, f"paired+mrstft loss did not decrease: {first} -> {last}"


def test_mrstft_zero_for_identical_waves():
    import jax.numpy as jnp

    from aas_enhancement_tpu.train.objectives import mr_stft_loss

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 8000], jnp.int32)
    same = float(mr_stft_loss(w, w, lengths))
    diff = float(mr_stft_loss(w, jnp.flip(w, axis=1), lengths))
    assert same < 1e-3
    assert diff > 10 * max(same, 1e-6)


def test_mrstft_padding_invariant():
    """The loss of an utterance must not depend on its padded bucket length."""
    import jax.numpy as jnp

    from aas_enhancement_tpu.train.objectives import mr_stft_loss

    rng = np.random.default_rng(1)
    n = 6000
    est = rng.standard_normal(n).astype(np.float32) * 0.1
    ref = est + rng.standard_normal(n).astype(np.float32) * 0.02
    vals = []
    for bucket in (8000, 16000):
        e = np.zeros(bucket, np.float32)
        r = np.zeros(bucket, np.float32)
        e[:n], r[:n] = est, ref
        vals.append(float(mr_stft_loss(jnp.asarray(e)[None], jnp.asarray(r)[None],
                                       jnp.asarray([n], jnp.int32))))
    assert abs(vals[0] - vals[1]) < 1e-4, vals


@pytest.mark.slow
def test_int16_feed_trains_like_float32(corpus):
    """Training through the int16 transport (DataConfig.feed_dtype) matches the
    float32 feed to quantization precision, end to end through the aas step."""
    losses = {}
    for fd in ("float32", "int16"):
        cfg = _tiny_cfg("aas")
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, feed_dtype=fd,
                                                   num_buckets=1))
        _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=6)
        losses[fd] = [r["loss_g"] for r in recs if "loss_g" in r]
    assert len(losses["float32"]) == len(losses["int16"]) >= 6
    for a, b in zip(losses["float32"], losses["int16"]):
        assert abs(a - b) / max(abs(a), 1e-6) < 5e-2, (losses["float32"],
                                                       losses["int16"])


def test_spec_augment_op():
    """spec_augment: zeros only inside <=n stripes of bounded width, stripes
    live in the valid time region, deterministic per key, off == identity."""
    import jax
    import jax.numpy as jnp

    from aas_enhancement_tpu.ops.masking import spec_augment

    b, t, f = 3, 50, 20
    x = jnp.ones((b, t, f))
    lengths = jnp.array([50, 30, 10], jnp.int32)
    key = jax.random.key(0)
    y = spec_augment(key, x, lengths, n_time=2, time_width=7,
                     n_freq=1, freq_width=4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(
        spec_augment(key, x, lengths, 2, 7, 1, 4)))  # deterministic

    yn = np.asarray(y)
    # Each row: zeroed time frames <= 2*7, zeroed freq bins <= 4.
    for i, ln in enumerate([50, 30, 10]):
        row = yn[i]
        t_zero = np.where((row == 0).all(axis=1))[0]
        f_zero = np.where((row == 0).all(axis=0))[0]
        assert len(t_zero) <= 14 and len(f_zero) <= 4
        assert all(z < ln for z in t_zero), "time stripe left the valid region"
        assert np.all((row == 0) | (row == 1))
    # Some masking actually happened somewhere in the batch.
    assert (yn == 0).any()


@pytest.mark.slow
def test_am_pretrain_spec_augment_decreases(corpus):
    cfg = _tiny_cfg("am", spec_augment=True, sa_time_width=5, sa_freq_width=5)
    _, recs = train(cfg, corpus["clean"], max_steps=16)
    first, last = _first_last(recs, "loss_ctc_am")
    assert last < first, f"AM CTC loss (SpecAugment) did not decrease: {first} -> {last}"
