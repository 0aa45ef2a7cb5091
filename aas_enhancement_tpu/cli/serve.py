"""`serve` entry point: live streaming-enhancement server.

Loads a trained enhancer checkpoint and serves concurrent live sessions over
TCP — every connected stream's next block runs in ONE jitted program per tick
(streaming.BatchedStreamingEnhancer; protocol in serve.py).

Usage:
  python -m aas_enhancement_tpu.cli.serve --checkpoint ck_aas \
      [--host 127.0.0.1] [--port 7207] [--max-streams 64] \
      [--chunk 1.0] [--lookahead 0.2] [--history 0.5]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="train-CLI checkpoint dir with enhancer params")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7207)
    p.add_argument("--max-streams", type=int, default=64)
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--lookahead", type=float, default=0.2)
    p.add_argument("--history", type=float, default=0.5)
    p.add_argument("--transcribe", action="store_true",
                   help="serve live TRANSCRIPTS (enhancer + AM per block; "
                        "checkpoint must carry acoustic-model params) — "
                        "response frames are UTF-8 transcript deltas")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from aas_enhancement_tpu.serve import EnhanceServer
    from aas_enhancement_tpu.train.loop import load_state

    state, cfg = load_state(args.checkpoint)
    if not state.g_params and not (args.transcribe and state.am_params):
        raise SystemExit(f"{args.checkpoint}: checkpoint has no enhancer "
                         f"(objective was {cfg.train.objective!r})")
    if args.transcribe and not state.am_params:
        raise SystemExit(f"{args.checkpoint}: --transcribe needs acoustic-"
                         f"model params (train objective 'am' or 'aas')")

    server = EnhanceServer(cfg, state.g_params, host=args.host,
                           port=args.port, max_streams=args.max_streams,
                           chunk_seconds=args.chunk,
                           lookahead_seconds=args.lookahead,
                           history_seconds=args.history,
                           am_params=(state.am_params if args.transcribe
                                      else None)).start()
    print(json.dumps({"serving": f"{server.address[0]}:{server.address[1]}",
                      "mode": "transcribe" if args.transcribe else "enhance",
                      "max_streams": args.max_streams,
                      "latency_s": args.chunk + args.lookahead}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
