"""CTC numerics: our scan CTC vs optax.ctc_loss vs brute-force enumeration
(SURVEY.md §4 item 1)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aas_enhancement_tpu.ops.ctc import ctc_loss


def _brute_force_ctc(log_probs: np.ndarray, labels: list[int], blank: int = 0) -> float:
    """-log sum over all alignments whose collapse equals `labels` (tiny T/V only)."""
    t, v = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(v), repeat=t):
        collapsed = []
        prev = None
        for p in path:
            if p != blank and p != prev:
                collapsed.append(p)
            prev = p
        if collapsed == list(labels):
            lp = sum(log_probs[i, p] for i, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_vs_brute_force():
    rng = np.random.default_rng(0)
    t, v = 5, 4
    logits = rng.standard_normal((1, t, v)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
    for labels in ([1], [1, 2], [2, 2], [1, 2, 3]):
        u = len(labels)
        lab = np.zeros((1, 4), np.int32)
        lab[0, :u] = labels
        lab_pad = np.ones((1, 4), np.float32)
        lab_pad[0, :u] = 0.0
        ours = float(ctc_loss(jnp.asarray(logits), jnp.zeros((1, t)),
                              jnp.asarray(lab), jnp.asarray(lab_pad))[0])
        ref = _brute_force_ctc(log_probs, labels)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vs_optax_padded(seed):
    """Random padded batches must match optax.ctc_loss exactly."""
    rng = np.random.default_rng(seed)
    b, t, v, u = 4, 12, 6, 5
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    t_lens = rng.integers(6, t + 1, size=b)
    u_lens = rng.integers(1, 4, size=b)
    logit_pad = np.ones((b, t), np.float32)
    label_pad = np.ones((b, u), np.float32)
    labels = np.zeros((b, u), np.int32)
    for i in range(b):
        logit_pad[i, : t_lens[i]] = 0.0
        label_pad[i, : u_lens[i]] = 0.0
        labels[i, : u_lens[i]] = rng.integers(1, v, size=u_lens[i])

    ours = ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                    jnp.asarray(labels), jnp.asarray(label_pad))
    ref = optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                         jnp.asarray(labels), jnp.asarray(label_pad))
    # optax leaks tiny probability through its log_epsilon=-1e5 sentinel; our loss
    # matches brute-force enumeration tighter than optax does (see test_vs_brute_force).
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-2, atol=5e-2)


def test_gradients_match_optax():
    rng = np.random.default_rng(3)
    b, t, v, u = 2, 8, 5, 3
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)).astype(np.int32))
    lp = jnp.zeros((b, t))
    lbp = jnp.zeros((b, u))

    g_ours = jax.grad(lambda x: jnp.sum(ctc_loss(x, lp, labels, lbp)))(logits)
    g_ref = jax.grad(lambda x: jnp.sum(optax.ctc_loss(x, lp, labels, lbp)))(logits)
    assert np.all(np.isfinite(np.asarray(g_ours)))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-3)


def test_grad_check():
    from jax.test_util import check_grads
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((1, 6, 4)).astype(np.float32))
    labels = jnp.asarray([[1, 2]], dtype=jnp.int32)

    def f(x):
        return jnp.sum(ctc_loss(x, jnp.zeros((1, 6)), labels, jnp.zeros((1, 2))))

    check_grads(f, (logits,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_jit_and_batch_consistency():
    rng = np.random.default_rng(5)
    b, t, v, u = 3, 10, 5, 4
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)).astype(np.int32))
    lp, lbp = jnp.zeros((b, t)), jnp.zeros((b, u))
    full = jax.jit(ctc_loss)(logits, lp, labels, lbp)
    for i in range(b):
        solo = ctc_loss(logits[i: i + 1], lp[i: i + 1], labels[i: i + 1], lbp[i: i + 1])
        np.testing.assert_allclose(float(full[i]), float(solo[0]), rtol=1e-5, atol=1e-5)


def test_weighted_mean_ignores_padded_rows():
    """Zero-weight (repeat-padded) rows must not contribute gradient or loss."""
    from aas_enhancement_tpu.ops.ctc import ctc_loss_mean
    rng = np.random.default_rng(6)
    logits1 = jnp.asarray(rng.standard_normal((1, 8, 5)).astype(np.float32))
    labels1 = jnp.asarray([[1, 2]], dtype=jnp.int32)
    lp1, lbp1 = jnp.zeros((1, 8)), jnp.zeros((1, 2))
    solo = float(ctc_loss_mean(logits1, lp1, labels1, lbp1))

    # Duplicate the row; weight the copy 0.
    logits2 = jnp.concatenate([logits1, logits1])
    labels2 = jnp.concatenate([labels1, labels1])
    lp2, lbp2 = jnp.zeros((2, 8)), jnp.zeros((2, 2))
    w = jnp.asarray([1.0, 0.0])
    weighted = float(ctc_loss_mean(logits2, lp2, labels2, lbp2, weights=w))
    np.testing.assert_allclose(weighted, solo, rtol=1e-6)

    g = jax.grad(lambda x: ctc_loss_mean(x, lp2, labels2, lbp2, weights=w))(logits2)
    assert float(jnp.abs(g[1]).max()) == 0.0, "zero-weight row leaked gradient"
