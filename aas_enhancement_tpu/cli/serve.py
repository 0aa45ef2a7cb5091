"""`serve` entry point: live streaming-enhancement server.

Loads a trained enhancer checkpoint and serves concurrent live sessions over
TCP — every connected stream's next block runs in ONE jitted program per tick
(streaming.BatchedStreamingEnhancer; protocol in serve.py).

Defaults encode the round-3 MEASURED deployment recipe (VERDICT r3 #6):

- Operating point: 1.0 s chunk / 0.5 s history always; lookahead 0.5 s in
  transcribe mode (the live-pipeline sweep's best — live_pipeline_r3.json:
  hybrid WER 11.3% at (1.0, 0.5, 0.5) vs 15.6% at lookahead 0.2) but 0.2 s
  in enhance mode (the enhancer-only sweep's knee — streaming_sweep_r3.json:
  longer lookahead buys the enhancer nothing and costs 300 ms latency).
- Weights: streaming-finetuned enhancer weights HELP the LM-less greedy
  transcripts that transcribe mode emits, but HURT under the hybrid beam
  rescore that offline consumers of enhanced AUDIO typically apply
  (streaming_finetune_r3.json / hybrid_fusion_r3.json
  streaming_finetune_interaction).  `--weights auto` therefore picks the
  streaming-finetuned checkpoint (when one is given via
  `--streaming-checkpoint`) in transcribe mode and the base checkpoint in
  enhance mode — but ONLY when the fine-tune was trained AT the serving
  operating point: round 4 measured that a 0.2 s-lookahead fine-tune
  deployed at the 0.5 s transcribe point HURTS (harsh live hybrid
  18.5%->22.7%, live_pipeline_r4_hard_ft.json), so `auto` checks the
  checkpoint's recorded stream_{chunk,lookahead,history}_s and falls back
  to offline weights on mismatch (ft_point_matches/guard_streaming_pick).
- Acoustic model: transcribe mode can serve a live-ADAPTED AM
  (`--am-checkpoint`, produced by scripts/am_streaming_finetune.py or
  `train --objective am --am-through-enhancer`).  The adapted AM is used
  only when its recorded operating point matches the serving point — the
  matched adaptation is a measured win on BOTH live legs under harsh SNR
  (greedy 65.1%->59.2%, hybrid 16.8%->15.5%,
  live_pipeline_r4_hard_amft.json) but, like the enhancer fine-tune, it is
  a HARSH-CONDITION tool: at 0-10 dB it is greedy-neutral and costs the
  hybrid rescore +2.1 points (live_pipeline_r4_amft.json) — supply
  --am-checkpoint only for harsh / greedy-focused deployments.

Usage:
  python -m aas_enhancement_tpu.cli.serve --checkpoint ck_aas \
      [--streaming-checkpoint ck_aas_stream_ft] [--transcribe] \
      [--am-checkpoint ck_am_stream_ft] \
      [--weights auto|offline|streaming] \
      [--host 127.0.0.1] [--port 7207] [--max-streams 64] \
      [--chunk 1.0] [--lookahead MODE-DEPENDENT] [--history 0.5]
"""

from __future__ import annotations

import argparse
import json
import time

# The measured-best operating points (live_pipeline_r3.json chosen_point and
# streaming_sweep_r3.json).  Tests pin these — change only with a new sweep.
DEFAULT_CHUNK_S = 1.0
DEFAULT_HISTORY_S = 0.5
DEFAULT_LOOKAHEAD_S = {"transcribe": 0.5, "enhance": 0.2}


def resolve_operating_point(transcribe: bool, chunk: float | None,
                            lookahead: float | None,
                            history: float | None) -> tuple[float, float, float]:
    """CLI overrides fall back to the measured-best deployment point."""
    mode = "transcribe" if transcribe else "enhance"
    return (DEFAULT_CHUNK_S if chunk is None else chunk,
            DEFAULT_LOOKAHEAD_S[mode] if lookahead is None else lookahead,
            DEFAULT_HISTORY_S if history is None else history)


def pick_weights(weights: str, transcribe: bool,
                 have_streaming: bool) -> str:
    """'offline' or 'streaming' per the measured interaction (module doc)."""
    if weights == "auto":
        return "streaming" if (transcribe and have_streaming) else "offline"
    if weights == "streaming" and not have_streaming:
        raise SystemExit("--weights streaming needs --streaming-checkpoint")
    return weights


def ft_point_matches(ft_cfg, chunk: float, lookahead: float,
                     history: float, tol: float = 1e-6,
                     flag: str = "streaming_finetune") -> bool:
    """True iff the fine-tuned checkpoint was trained AT this serving point.

    A streaming fine-tune specializes the enhancer to one windowing; serving
    it at a different one is measurably harmful (live_pipeline_r4_hard_ft
    .json: a 0.2 s-lookahead fine-tune deployed at the 0.5 s transcribe
    point costs 18.5%->22.7% live hybrid WER under harsh SNR).  A checkpoint
    whose config does not record a streaming fine-tune at all (e.g. a plain
    train-CLI checkpoint) never matches — unknown provenance is off-point.

    `flag` selects which fine-tune the checkpoint must record:
    "streaming_finetune" (enhancer) or "streaming_finetune_am" (the
    live-adapted acoustic model, scripts/am_streaming_finetune.py).
    """
    t = ft_cfg.train
    return (bool(getattr(t, flag))
            and abs(t.stream_chunk_s - chunk) <= tol
            and abs(t.stream_lookahead_s - lookahead) <= tol
            and abs(t.stream_history_s - history) <= tol)


def guard_streaming_pick(requested: str, ft_cfg, chunk: float,
                         lookahead: float, history: float):
    """Final weight choice once the streaming checkpoint's config is known.

    Returns (which, warning_or_None): `auto` falls back to offline weights
    when the fine-tune's recorded operating point differs from the serving
    point (the measured-safe default); an explicit `--weights streaming` is
    obeyed but warned about.
    """
    if ft_point_matches(ft_cfg, chunk, lookahead, history):
        return "streaming", None
    t = ft_cfg.train
    trained = (t.stream_chunk_s, t.stream_lookahead_s, t.stream_history_s)
    msg = (f"streaming checkpoint fine-tuned at chunk/lookahead/history "
           f"{trained} but serving at {(chunk, lookahead, history)} — "
           f"off-point fine-tunes hurt (live_pipeline_r4_hard_ft.json)")
    if requested == "auto":
        return "offline", msg + "; --weights auto falls back to offline"
    return "streaming", ("WARNING: " + msg
                         + " (explicit --weights streaming, serving anyway)")


def deployment_advisories(which: str, am_weights: str) -> list[str]:
    """Measured condition-dependent interactions the operator must know
    (VERDICT r4 weak #6) — the operating-point guards above catch windowing
    MISMATCHES, but a matched adaptation can still be the wrong serving
    choice for the deployment's SNR condition / decode mode.  Full matrix:
    README.md "Deployment decision matrix".

    `which`      enhancer weights actually served ("offline"/"streaming")
    `am_weights` acoustic model actually served ("base"/"adapted"/absent "")
    """
    adv = []
    if am_weights == "adapted":
        adv.append(
            "adapted AM served: helps LM-less greedy transcripts (round-5 "
            "distill-anchored adaptation: live greedy 37.0%->35.7% easy, "
            "58.4%->56.7% harsh) but costs a downstream hybrid beam+LM "
            "rescore on BOTH conditions when the enhancer is a full-budget "
            "blockwise continuation (live_pipeline_r5{,_hard}_amft.json: "
            "easy 5.46%->5.88%, harsh 12.6%->14.3%) — if consumers "
            "rescore, serve the base AM; AM adaptation is a greedy-"
            "deployment tool")
    if which == "streaming":
        adv.append(
            "streaming weights served: a SHORT post-hoc fine-tune decodes "
            "worse than base under a hybrid beam+LM rescore "
            "(hybrid_fusion_r3.json streaming_finetune_interaction), but a "
            "full-budget blockwise CONTINUATION beats base on every live "
            "leg — greedy AND hybrid, both conditions (live_pipeline_r5"
            "{,_hard}_b32.json: hybrid 6.7%->2.1% easy, 18.5%->5.5% harsh) "
            "— prefer the continuation recipe (train --streaming-finetune "
            "--g-checkpoint <offline-ck> at full LR/budget) over 300-step "
            "patches")
    return adv


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="train-CLI checkpoint dir with enhancer params")
    p.add_argument("--streaming-checkpoint", default="",
                   help="optional streaming-finetuned checkpoint dir "
                        "(scripts/streaming_finetune_eval.py); used by "
                        "--weights auto in transcribe mode")
    p.add_argument("--weights", choices=("auto", "offline", "streaming"),
                   default="auto",
                   help="which enhancer weights to serve (auto = the "
                        "measured-best per mode; see module docstring)")
    p.add_argument("--am-checkpoint", default="",
                   help="live-adapted acoustic-model checkpoint dir "
                        "(scripts/am_streaming_finetune.py or train "
                        "--am-through-enhancer); transcribe mode serves its "
                        "AM when it was adapted AT the serving point "
                        "(measured win: live_pipeline_r4_hard_amft.json "
                        "16.8%->15.5% live hybrid), else falls back to the "
                        "base checkpoint's AM with a warning")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7207)
    p.add_argument("--max-streams", type=int, default=64)
    p.add_argument("--chunk", type=float, default=None,
                   help=f"block seconds (default {DEFAULT_CHUNK_S})")
    p.add_argument("--lookahead", type=float, default=None,
                   help="lookahead seconds (default "
                        f"{DEFAULT_LOOKAHEAD_S['transcribe']} transcribe / "
                        f"{DEFAULT_LOOKAHEAD_S['enhance']} enhance — the "
                        "measured-best points)")
    p.add_argument("--history", type=float, default=None,
                   help=f"history seconds (default {DEFAULT_HISTORY_S})")
    p.add_argument("--transcribe", action="store_true",
                   help="serve live TRANSCRIPTS (enhancer + AM per block; "
                        "checkpoint must carry acoustic-model params) — "
                        "response frames are UTF-8 transcript deltas")
    args = p.parse_args(argv)

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    from aas_enhancement_tpu.serve import EnhanceServer
    from aas_enhancement_tpu.train.loop import load_state

    chunk, lookahead, history = resolve_operating_point(
        args.transcribe, args.chunk, args.lookahead, args.history)
    which = pick_weights(args.weights, args.transcribe,
                         bool(args.streaming_checkpoint))

    state, cfg = load_state(args.checkpoint)
    g_params = state.g_params
    if which == "streaming":
        ft_state, ft_cfg = load_state(args.streaming_checkpoint)
        if not ft_state.g_params:
            raise SystemExit(f"{args.streaming_checkpoint}: checkpoint has "
                             f"no enhancer params")
        which, warn = guard_streaming_pick(args.weights, ft_cfg,
                                           chunk, lookahead, history)
        if warn:
            print(f"serve: {warn}", flush=True)
        if which == "streaming":
            g_params = ft_state.g_params
    if not g_params and not (args.transcribe and state.am_params):
        raise SystemExit(f"{args.checkpoint}: checkpoint has no enhancer "
                         f"(objective was {cfg.train.objective!r})")
    if args.transcribe and not state.am_params and not args.am_checkpoint:
        raise SystemExit(f"{args.checkpoint}: --transcribe needs acoustic-"
                         f"model params (train objective 'am' or 'aas')")

    am_params, am_weights = state.am_params, "base"
    if args.transcribe and args.am_checkpoint:
        am_state, am_cfg = load_state(args.am_checkpoint)
        if not am_state.am_params:
            raise SystemExit(f"{args.am_checkpoint}: checkpoint has no "
                             f"acoustic-model params")
        if ft_point_matches(am_cfg, chunk, lookahead, history,
                            flag="streaming_finetune_am"):
            am_params, am_weights = am_state.am_params, "adapted"
        elif not state.am_params:
            raise SystemExit(
                f"{args.am_checkpoint}: AM adaptation point differs from the "
                f"serving point and {args.checkpoint} carries no base AM to "
                f"fall back to")
        else:
            t = am_cfg.train
            print(f"serve: AM checkpoint adapted at chunk/lookahead/history "
                  f"{(t.stream_chunk_s, t.stream_lookahead_s, t.stream_history_s)} "
                  f"but serving at {(chunk, lookahead, history)} — falling "
                  f"back to the base AM (off-point fine-tunes hurt, "
                  f"live_pipeline_r4_hard_ft.json)", flush=True)

    advisories = deployment_advisories(
        which, am_weights if args.transcribe else "")
    for a in advisories:
        print(f"serve advisory: {a}", flush=True)

    server = EnhanceServer(cfg, g_params, host=args.host,
                           port=args.port, max_streams=args.max_streams,
                           chunk_seconds=chunk,
                           lookahead_seconds=lookahead,
                           history_seconds=history,
                           am_params=(am_params if args.transcribe
                                      else None)).start()
    print(json.dumps({"serving": f"{server.address[0]}:{server.address[1]}",
                      "mode": "transcribe" if args.transcribe else "enhance",
                      "weights": which,
                      **({"am_weights": am_weights} if args.transcribe
                         else {}),
                      "chunk_s": chunk, "lookahead_s": lookahead,
                      "history_s": history,
                      "max_streams": args.max_streams,
                      "latency_s": chunk + lookahead,
                      "advisories": advisories}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
