"""bf16 compute mode (the production bench configuration) stays finite and trains."""

import pytest

import numpy as np

from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                        DiscriminatorConfig, EnhancerConfig,
                                        TrainConfig)
from aas_enhancement_tpu.data.synthetic import generate_corpus
from aas_enhancement_tpu.train.loop import train


@pytest.mark.slow
def test_aas_bf16_trains(tmp_path_factory):
    corpus = generate_corpus(str(tmp_path_factory.mktemp("c")), n_utts=8, seed=2)
    cfg = Config(
        am=AMConfig(rnn_hidden=32, rnn_layers=1, conv_channels=8, dtype="bfloat16"),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1, rnn_hidden=16,
                                rnn_layers=1, dtype="bfloat16"),
        discriminator=DiscriminatorConfig(channels=(8, 16), dtype="bfloat16"),
        train=TrainConfig(objective="aas", batch_size=4, epochs=100, log_every=1,
                          lr_g=1e-3, lr_d=1e-3),
        data=DataConfig(num_buckets=1),
    )
    _, recs = train(cfg, corpus["noisy"], corpus["clean"], max_steps=10)
    losses = [r["loss_g"] for r in recs]
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), f"bf16 loss flat: {losses}"