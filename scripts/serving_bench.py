"""Streaming-serving capacity bench: concurrent real-time streams per chip.

Measures BatchedStreamingEnhancer on the attached device at the production
enhancer size: N live streams, each pushing real-time audio, enhanced in ONE
jitted program per tick.  Headline = how many concurrent real-time streams one
chip sustains at the chosen chunk/lookahead operating point (BASELINE.md
streaming curve: 1.0 s chunk / 0.2 s lookahead / 0.5 s history), plus the
per-tick latency that a serving process would add on top of the 1.2 s
algorithmic latency.

Usage: python scripts/serving_bench.py [--streams 64] [--ticks 20]
Prints one JSON line.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

from aas_enhancement_tpu.utils import jax_cache
jax_cache.enable()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=64)
    p.add_argument("--ticks", type=int, default=20)
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--lookahead", type=float, default=0.2)
    p.add_argument("--history", type=float, default=0.5)
    p.add_argument("--transcribe", action="store_true",
                   help="bench the live RECOGNITION engine (enhancer + AM "
                        "per block, streaming_asr.BatchedStreamingRecognizer)"
                        " instead of enhancement only")
    args = p.parse_args()

    import jax
    import numpy as np
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.enhance import init_enhancer
    from aas_enhancement_tpu.streaming import BatchedStreamingEnhancer

    cfg = Config()                      # production model sizes
    params = init_enhancer(cfg, jax.random.key(0))
    sr = cfg.audio.sample_rate
    if args.transcribe:
        import jax.numpy as jnp
        from aas_enhancement_tpu.models.am import AcousticModel
        from aas_enhancement_tpu.streaming_asr import BatchedStreamingRecognizer

        am = AcousticModel(cfg.am)
        x = jnp.zeros((1, 64, cfg.audio.num_bins), jnp.float32)
        am_params = am.init(jax.random.key(1), x, jnp.array([64], jnp.int32))
        eng = BatchedStreamingRecognizer(
            cfg, am_params, g_params=params, max_streams=args.streams,
            chunk_seconds=args.chunk, lookahead_seconds=args.lookahead,
            history_seconds=args.history)
    else:
        eng = BatchedStreamingEnhancer(cfg, params, max_streams=args.streams,
                                       chunk_seconds=args.chunk,
                                       lookahead_seconds=args.lookahead,
                                       history_seconds=args.history)
    slots = [eng.open() for _ in range(args.streams)]
    rng = np.random.default_rng(0)
    push = int((args.chunk + args.lookahead) * sr)

    # Warm-up tick compiles the [max_streams, window] program.
    for s in slots:
        eng.feed(s, (rng.standard_normal(push) * 0.1).astype(np.float32))
    t0 = time.perf_counter()
    out = eng.step()
    warm_s = time.perf_counter() - t0
    assert len(out) == args.streams

    tick_s = []
    for _ in range(args.ticks):
        for s in slots:
            eng.feed(s, (rng.standard_normal(push) * 0.1).astype(np.float32))
        t0 = time.perf_counter()
        out = eng.step()
        # step() returns host arrays — the tick time includes D2H, as a
        # serving process would pay it.
        tick_s.append(time.perf_counter() - t0)
        assert len(out) == args.streams
    tick_s.sort()
    p50 = tick_s[len(tick_s) // 2]
    p95 = tick_s[min(len(tick_s) - 1, int(0.95 * len(tick_s)))]
    # Each tick advances every stream by `chunk` seconds of audio; the chip
    # keeps up with S concurrent real-time streams iff tick_p50 < chunk, and
    # capacity extrapolates as S * chunk / tick (ticks are compute-bound and
    # near-linear in batch until the MXU fills).
    capacity = args.streams * args.chunk / p50
    print(json.dumps({
        "mode": "transcribe" if args.transcribe else "enhance",
        "streams": args.streams, "chunk_s": args.chunk,
        "lookahead_s": args.lookahead, "history_s": args.history,
        "tick_p50_s": round(p50, 4), "tick_p95_s": round(p95, 4),
        "warmup_s": round(warm_s, 1),
        "realtime_ok": bool(p50 < args.chunk),
        "est_realtime_streams_per_chip": round(capacity, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
