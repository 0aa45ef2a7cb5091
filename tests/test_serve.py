"""Live enhancement server: TCP sessions through the batched engine must
reproduce the single-stream StreamingEnhancer output per client."""

import threading

import jax
import numpy as np
import pytest

from aas_enhancement_tpu.config import Config, EnhancerConfig
from aas_enhancement_tpu.data.synthetic import synth_utterance
from aas_enhancement_tpu.enhance import init_enhancer
from aas_enhancement_tpu.serve import EnhanceServer, enhance_via_server
from aas_enhancement_tpu.streaming import StreamingEnhancer

KW = dict(chunk_seconds=0.25, lookahead_seconds=0.05, history_seconds=0.25)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                         rnn_hidden=16, rnn_layers=1))
    params = init_enhancer(cfg, jax.random.key(0))
    return cfg, params


def reference(cfg, params, wav):
    eng = StreamingEnhancer(cfg, params, **KW)
    return np.concatenate([eng.feed(wav), eng.flush()])


def test_concurrent_clients_match_single_stream(setup):
    cfg, params = setup
    wavs = [synth_utterance("SERVER STREAM ONE", seed=30),
            synth_utterance("A SECOND CLIENT TALKING LONGER", seed=31)]
    server = EnhanceServer(cfg, params, max_streams=4, **KW).start()
    try:
        results = [None] * len(wavs)

        def client(i):
            results[i] = enhance_via_server(server.address, wavs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(wavs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        server.stop()
    for got, wav in zip(results, wavs):
        assert got is not None and got.shape == wav.shape
        np.testing.assert_allclose(got, reference(cfg, params, wav),
                                   atol=2e-5)


def test_transcribe_mode_matches_recognizer(setup):
    """A transcribe-mode session returns the StreamingRecognizer transcript
    (UTF-8 deltas concatenated)."""
    import dataclasses

    import jax.numpy as jnp

    from aas_enhancement_tpu.config import AMConfig
    from aas_enhancement_tpu.models.am import AcousticModel
    from aas_enhancement_tpu.serve import transcribe_via_server
    from aas_enhancement_tpu.streaming_asr import StreamingRecognizer

    cfg, g_params = setup
    cfg = dataclasses.replace(cfg, am=AMConfig(rnn_hidden=16, rnn_layers=1,
                                               conv_channels=8))
    am = AcousticModel(cfg.am)
    x = jnp.zeros((1, 64, cfg.audio.num_bins), jnp.float32)
    am_params = am.init(jax.random.key(2), x, jnp.array([64], jnp.int32))
    wav = synth_utterance("TRANSCRIBE THIS LIVE", seed=40)

    kw = dict(chunk_seconds=0.5, lookahead_seconds=0.2, history_seconds=0.5)
    server = EnhanceServer(cfg, g_params, max_streams=2, am_params=am_params,
                           **kw).start()
    try:
        got = transcribe_via_server(server.address, wav)
    finally:
        server.stop()
    ref = StreamingRecognizer(cfg, am_params, g_params=g_params, **kw)
    ref.feed(wav)
    ref.flush()
    assert got == ref.transcript()


def test_server_full_refuses_politely(setup):
    cfg, params = setup
    wav = synth_utterance("ONLY ROOM FOR ONE", seed=32)
    server = EnhanceServer(cfg, params, max_streams=1, **KW).start()
    try:
        import socket as socket_mod
        from aas_enhancement_tpu.serve import recv_frame, send_frame

        # Occupy the only slot with a half-open session.
        first = socket_mod.create_connection(server.address)
        send_frame(first, wav[:1000])
        # Second connection must get immediate end-of-stream.
        second = socket_mod.create_connection(server.address)
        assert recv_frame(second) is None
        second.close()
        first.close()
    finally:
        server.stop()


def test_cli_defaults_encode_measured_recipe():
    """serve CLI defaults must match the measured-best deployment point
    (VERDICT r3 #6: live_pipeline_r3.json chosen_point for transcribe,
    streaming_sweep_r3.json knee for enhance) and the weights interaction
    (streaming-finetuned weights only for LM-less greedy transcripts)."""
    from aas_enhancement_tpu.cli import serve as cli_serve

    assert cli_serve.resolve_operating_point(True, None, None, None) == (1.0, 0.5, 0.5)
    assert cli_serve.resolve_operating_point(False, None, None, None) == (1.0, 0.2, 0.5)
    assert cli_serve.resolve_operating_point(True, 2.0, 0.1, 0.3) == (2.0, 0.1, 0.3)

    assert cli_serve.pick_weights("auto", True, True) == "streaming"
    assert cli_serve.pick_weights("auto", True, False) == "offline"
    assert cli_serve.pick_weights("auto", False, True) == "offline"
    assert cli_serve.pick_weights("offline", True, True) == "offline"
    assert cli_serve.pick_weights("streaming", True, True) == "streaming"
    with pytest.raises(SystemExit):
        cli_serve.pick_weights("streaming", False, False)


def test_ft_operating_point_guard():
    """`--weights auto` must refuse a fine-tune trained at a different
    operating point (round-4 measurement: off-point fine-tunes hurt the
    fully-live stack, live_pipeline_r4_hard_ft.json 18.5%->22.7%)."""
    import dataclasses

    from aas_enhancement_tpu.cli import serve as cli_serve
    from aas_enhancement_tpu.config import Config

    def ft_cfg(chunk, lookahead, history, finetuned=True):
        cfg = Config()
        return cfg.replace(train=dataclasses.replace(
            cfg.train, streaming_finetune=finetuned, stream_chunk_s=chunk,
            stream_lookahead_s=lookahead, stream_history_s=history))

    matched = ft_cfg(1.0, 0.5, 0.5)
    off_point = ft_cfg(1.0, 0.2, 0.5)
    plain = ft_cfg(1.0, 0.5, 0.5, finetuned=False)

    assert cli_serve.ft_point_matches(matched, 1.0, 0.5, 0.5)
    assert not cli_serve.ft_point_matches(off_point, 1.0, 0.5, 0.5)
    # A checkpoint that never ran the streaming fine-tune never matches.
    assert not cli_serve.ft_point_matches(plain, 1.0, 0.5, 0.5)

    which, warn = cli_serve.guard_streaming_pick("auto", matched, 1.0, 0.5, 0.5)
    assert (which, warn) == ("streaming", None)
    # auto + mismatch -> measured-safe fallback to offline, with a warning.
    which, warn = cli_serve.guard_streaming_pick("auto", off_point, 1.0, 0.5, 0.5)
    assert which == "offline" and "falls back" in warn
    # Explicit --weights streaming is obeyed but warned about.
    which, warn = cli_serve.guard_streaming_pick("streaming", off_point,
                                                 1.0, 0.5, 0.5)
    assert which == "streaming" and warn.startswith("WARNING")


def test_am_adaptation_point_guard():
    """`--am-checkpoint` must only be served when the AM adaptation's
    recorded operating point matches the serving point (the enhancer guard's
    rationale applied to the live-adapted AM; matched-point win:
    live_pipeline_r4_hard_amft.json 16.8%->15.5% live hybrid)."""
    import dataclasses

    from aas_enhancement_tpu.cli import serve as cli_serve
    from aas_enhancement_tpu.config import Config

    def am_cfg(chunk, lookahead, history, adapted=True):
        cfg = Config()
        return cfg.replace(train=dataclasses.replace(
            cfg.train, streaming_finetune_am=adapted,
            am_through_enhancer=adapted, stream_chunk_s=chunk,
            stream_lookahead_s=lookahead, stream_history_s=history))

    matched = am_cfg(1.0, 0.5, 0.5)
    off_point = am_cfg(1.0, 0.2, 0.5)
    plain = am_cfg(1.0, 0.5, 0.5, adapted=False)

    flag = "streaming_finetune_am"
    assert cli_serve.ft_point_matches(matched, 1.0, 0.5, 0.5, flag=flag)
    assert not cli_serve.ft_point_matches(off_point, 1.0, 0.5, 0.5, flag=flag)
    # A plain AM checkpoint (no blockwise adaptation recorded) never matches.
    assert not cli_serve.ft_point_matches(plain, 1.0, 0.5, 0.5, flag=flag)
    # The enhancer flag must not leak into the AM decision: a checkpoint
    # with only streaming_finetune (G) set is NOT an adapted AM.
    g_only = plain.replace(train=dataclasses.replace(
        plain.train, streaming_finetune=True))
    assert not cli_serve.ft_point_matches(g_only, 1.0, 0.5, 0.5, flag=flag)


def test_deployment_advisories():
    """Condition-dependent interactions print whenever a served combination
    carries one (VERDICT r4 weak #6) — the README decision matrix in code."""
    from aas_enhancement_tpu.cli import serve as cli_serve

    # Base everything: nothing to warn about.
    assert cli_serve.deployment_advisories("offline", "base") == []
    assert cli_serve.deployment_advisories("offline", "") == []
    # Adapted AM served: must cite the measured hybrid-rescore regression
    # (round 5: both conditions regress under the continuation G).
    adv = cli_serve.deployment_advisories("offline", "adapted")
    assert len(adv) == 1 and "rescore" in adv[0] and "5.88%" in adv[0]
    # Streaming G served: must distinguish the short-finetune rescore
    # interaction from the measured-best blockwise continuation.
    adv = cli_serve.deployment_advisories("streaming", "base")
    assert len(adv) == 1 and "rescore" in adv[0]
    assert "continuation" in adv[0] and "2.1%" in adv[0]
    # Both: both advisories, AM first.
    adv = cli_serve.deployment_advisories("streaming", "adapted")
    assert len(adv) == 2
