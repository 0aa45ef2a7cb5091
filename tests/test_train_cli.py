"""Train-CLI coverage for the blockwise-continuation recipe (round 5).

The measured-best live recipe (BASELINE.md round-5 streaming-native table:
offline AAS training -> full-LR blockwise continuation at the deployment
windowing, streaming_native_cont_r5.json) must be expressible through
`python -m aas_enhancement_tpu.cli.train` alone:

  --objective aas --streaming-finetune --g-checkpoint <offline-ck> \
      --stream-chunk 1.0 --stream-lookahead 0.5 --stream-history 0.5

These tests pin (1) the --stream-* flags flow into TrainConfig and the saved
checkpoint config.json (so `serve --weights auto` / live_pipeline_eval pick
the operating point up), and (2) --g-checkpoint warm-starts BOTH the
generator and the discriminator for GAN objectives (a continuation resumes
the full GAN state, not G against a fresh D).
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        DiscriminatorConfig, EnhancerConfig,
                                        TrainConfig)
from aas_enhancement_tpu.data.synthetic import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    return generate_corpus(str(d), n_utts=8, seed=5, vocab_chars=6)


def _tiny_cfg_json(tmp_path, objective="aas"):
    cfg = Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=24, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 16)),
        train=TrainConfig(objective=objective, batch_size=4, epochs=100,
                          log_every=1),
        data=DataConfig(num_buckets=1),
    )
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as f:
        f.write(cfg.to_json())
    return path


def _leaf_sum(tree):
    return sum(float(np.abs(np.asarray(x)).sum())
               for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
def test_blockwise_continuation_through_cli(corpus, tmp_path):
    """Offline aas train (2 steps, checkpointed) -> CLI continuation with
    --streaming-finetune --g-checkpoint --stream-*: the continuation's saved
    config records the operating point and its params warm-start from the
    offline checkpoint (G and D both)."""
    from aas_enhancement_tpu.cli import train as train_cli
    from aas_enhancement_tpu.train.loop import load_state

    cfg_json = _tiny_cfg_json(tmp_path)
    ck_off = str(tmp_path / "ck_offline")
    train_cli.main([
        "--objective", "aas", "--config", cfg_json,
        "--noisy-manifest", corpus["noisy"],
        "--clean-manifest", corpus["clean"],
        "--steps", "2", "--checkpoint-dir", ck_off,
    ])
    off_state, off_cfg = load_state(ck_off)
    assert off_state.g_params and off_state.d_params

    ck_cont = str(tmp_path / "ck_cont")
    train_cli.main([
        "--objective", "aas", "--config", cfg_json,
        "--noisy-manifest", corpus["noisy"],
        "--clean-manifest", corpus["clean"],
        "--steps", "1", "--checkpoint-dir", ck_cont,
        "--streaming-finetune", "--g-checkpoint", ck_off,
        "--stream-chunk", "0.5", "--stream-lookahead", "0.25",
        "--stream-history", "0.25",
    ])
    cont_cfg = Config.from_json(
        open(os.path.join(ck_cont, "config.json")).read())
    assert cont_cfg.train.streaming_finetune is True
    assert cont_cfg.train.stream_chunk_s == 0.5
    assert cont_cfg.train.stream_lookahead_s == 0.25
    assert cont_cfg.train.stream_history_s == 0.25

    # One step of continuation: params must have MOVED FROM the offline
    # checkpoint values (warm start), i.e. much closer to them than a fresh
    # init would be.  Compare leaf sums: after a single small-LR step the
    # relative drift from the warm start is tiny.
    cont_state, _ = load_state(ck_cont)
    for name in ("g_params", "d_params"):
        warm = _leaf_sum(getattr(off_state, name))
        cont = _leaf_sum(getattr(cont_state, name))
        assert abs(cont - warm) / max(warm, 1e-9) < 0.2, (
            f"{name} did not warm-start from --g-checkpoint "
            f"(offline {warm:.4f} vs continuation {cont:.4f})")


@pytest.mark.slow
def test_stream_flags_reach_config(corpus, tmp_path):
    """--stream-* flags alone (no training) flow into the checkpoint config:
    run 0 steps via --steps 1 on the cheap paired objective."""
    from aas_enhancement_tpu.cli import train as train_cli

    cfg_json = _tiny_cfg_json(tmp_path, objective="paired")
    ck = str(tmp_path / "ck_paired")
    train_cli.main([
        "--objective", "paired", "--config", cfg_json,
        "--noisy-manifest", corpus["noisy"],
        "--clean-manifest", corpus["clean"],
        "--steps", "1", "--checkpoint-dir", ck,
        "--streaming-finetune",
        "--stream-chunk", "2.0", "--stream-lookahead", "0.1",
        "--stream-history", "1.5",
    ])
    cfg = Config.from_json(open(os.path.join(ck, "config.json")).read())
    tr = cfg.train
    assert (tr.streaming_finetune, tr.stream_chunk_s, tr.stream_lookahead_s,
            tr.stream_history_s) == (True, 2.0, 0.1, 1.5)
