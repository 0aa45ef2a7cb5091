"""Decode-stack cost bench (VERDICT r3 #3): utts/s and p50/p95 latency for
greedy vs beam {16,32,64} x {no-LM, char, word, hybrid}, python vs C++.

The reference's eval path ran ctcdecode (C++ prefix beam + KenLM) on host;
its cost was a real constraint (SURVEY.md §2 "NATIVE: ctcdecode").  This
bench puts a number on the rebuild's decode stack so the quality-cost trade
in BASELINE.md's WER table is explicit.

Reuses a trained e2e pipeline (scripts/e2e_demo.py writes sweep_state.json):
log-probs for the held-out test split are computed ONCE on the device with
the trained enhancer+AM, pulled to host, and every decoder variant is timed
on the same arrays — so the grid isolates DECODE cost, not forward cost.
Greedy is timed separately on-device (it is a jitted TPU program, not a host
decoder).  Also times the live-session final-rescore call (beam-64 hybrid on
one utterance's accumulated log-probs) at the deployment operating point.

Usage:
  python scripts/decode_bench.py --workdir /tmp/aas_e2e_full \
      --out decode_bench_r4.json
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
import time

import numpy as np


def pct(xs, q):
    return float(np.percentile(np.asarray(xs, np.float64), q))


def time_host_decoder(decode_fn, lps, lens, refs):
    """Per-utterance host decode: returns throughput + latency percentiles.

    Each utterance is a separate decoder call (the serving pattern: one
    final-rescore per stream), so per-call costs like the word-LM native
    export are included — that is the latency a live session actually pays.
    """
    from aas_enhancement_tpu.decode.wer import corpus_wer
    lat_ms, hyps = [], []
    audio_frames = 0
    t_all = time.perf_counter()
    for lp, t in zip(lps, lens):
        t0 = time.perf_counter()
        hyps.append(decode_fn(lp[:t]))
        lat_ms.append((time.perf_counter() - t0) * 1e3)
        audio_frames += int(t)
    wall = time.perf_counter() - t_all
    return {"utts_per_s": round(len(lps) / wall, 2),
            "p50_ms": round(pct(lat_ms, 50), 2),
            "p95_ms": round(pct(lat_ms, 95), 2),
            "wer": round(corpus_wer(refs, hyps), 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/aas_e2e_full",
                   help="e2e_demo workdir holding sweep_state.json")
    p.add_argument("--result-json", default="",
                   help="e2e result json with tuned fusion weights "
                        "(default: <workdir>/result.json)")
    p.add_argument("--python-max-utts", type=int, default=12,
                   help="cap per-leg utterances for the python fallback grid "
                        "(it exists for parity, not production; per-utt "
                        "latency is unbiased on the subset)")
    p.add_argument("--out", default="decode_bench_r4.json")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import jax
    import jax.numpy as jnp
    from aas_enhancement_tpu.config import Config
    from aas_enhancement_tpu.decode import beam as beam_mod
    from aas_enhancement_tpu.decode.beam import beam_decode
    from aas_enhancement_tpu.decode.greedy import decode_batch
    from aas_enhancement_tpu.decode.lm import CharNGramLM, WordNGramLM
    from aas_enhancement_tpu.evaluation import eval_dataset, make_eval_forward

    with open(os.path.join(args.workdir, "sweep_state.json")) as f:
        sweep = json.load(f)
    with open(sweep["params_pkl"], "rb") as f:
        trained = pickle.load(f)
    cfg = Config.from_json(trained["cfg_json"])
    am_params, g_params = trained["am_params"], trained["g_params"]

    rj = args.result_json or os.path.join(args.workdir, "result.json")
    tuned = json.load(open(rj)) if os.path.exists(rj) else {}
    hy = tuned.get("lm_hybrid", {})
    weights = {
        "char": (tuned.get("lm_clm_alpha", 1.5), tuned.get("lm_clm_beta", 0.5)),
        "word": (tuned.get("lm_wlm_alpha", 1.0), tuned.get("lm_wlm_beta", 0.0)),
        "hybrid": (hy.get("alpha", 1.5), hy.get("beta", 0.5),
                   hy.get("word_alpha", 0.6), hy.get("word_beta", 0.0)),
    }

    # LMs train on TRAIN transcripts only, as in the e2e protocol.
    train_manifests = [sweep["train_noisy"]]
    clm = CharNGramLM.from_manifests(train_manifests, order=4)
    wlm = WordNGramLM.from_manifests(train_manifests)
    # Warm the cached exports OUTSIDE the timed legs: the char dense table
    # (V^order entries, pure-python backoff bake) takes seconds and would
    # otherwise land entirely on the first char leg's wall clock.
    t0 = time.perf_counter()
    clm.dense_table()
    wlm.export_native()
    print(f"LM export warm-up: {time.perf_counter() - t0:.2f}s", flush=True)

    # --- One device pass over the held-out test split: log-probs + refs.
    from aas_enhancement_tpu.labels import decode_ids
    ds = eval_dataset(cfg, sweep["test_noisy"])
    forward = make_eval_forward(cfg, use_enhancer=True)
    lps, lens, refs = [], [], []
    dev_logits = []  # kept on device for the greedy leg
    for batch in ds.batches(16, seed=0, epoch=0):
        logits, pads = forward(am_params, g_params,
                               jnp.asarray(batch.wav),
                               jnp.asarray(batch.wav_lengths))
        k = batch.size
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1), np.float32)
        bl = np.sum(np.asarray(pads) < 0.5, axis=1).astype(np.int32)
        dev_logits.append((logits, pads, k))
        for i in range(k):
            lps.append(lp[i])
            lens.append(int(bl[i]))
            n = int(np.sum(batch.label_paddings[i] < 0.5))
            refs.append(decode_ids(batch.labels[i][:n]))
    frames_per_s = 1.0 / (cfg.audio.window_stride * 2)  # AM conv stem halves time
    audio_s = sum(lens) / frames_per_s
    print(f"test split: {len(lps)} utts, {audio_s:.1f} s audio "
          f"(AM frames @ {frames_per_s:.1f}/s)", flush=True)

    result = {"n_utts": len(lps), "audio_s": round(audio_s, 1),
              "workdir": args.workdir, "weights": weights, "legs": {}}

    # --- Greedy: jitted device decode on the already-computed logits.
    for (logits, pads, _k) in dev_logits:  # warm the jit once
        decode_batch(logits, pads)
        break
    t0 = time.perf_counter()
    g_hyps = []
    for (logits, pads, k) in dev_logits:
        g_hyps.extend(decode_batch(logits, pads)[:k])
    g_wall = time.perf_counter() - t0
    from aas_enhancement_tpu.decode.wer import corpus_wer
    result["legs"]["greedy"] = {
        "utts_per_s": round(len(lps) / g_wall, 2),
        "batched": True, "batch_size": 16,
        "wer": round(corpus_wer(refs, g_hyps), 4)}
    print("greedy", result["legs"]["greedy"], flush=True)

    # --- Beam grid.  Native first (the production path), then python parity
    # legs on a subset.
    native = beam_mod.build()
    result["native_available"] = bool(native)

    def leg_fn(impl, width, fusion):
        ca, cb = weights["char"][:2]
        wa, wb = weights["word"][:2]
        ha, hb, hwa, hwb = weights["hybrid"]
        kw = {}
        if fusion == "char":
            kw = dict(lm=clm, lm_alpha=ca, lm_beta=cb)
        elif fusion == "word":
            kw = dict(lm=wlm, lm_alpha=wa, lm_beta=wb)
        elif fusion == "hybrid":
            kw = dict(lm=clm, lm_alpha=ha, lm_beta=hb,
                      word_lm=wlm, word_alpha=hwa, word_beta=hwb)

        def fn(lp):
            if impl == "python":
                r = beam_mod.beam_search_python(
                    lp, width, **_python_kwargs(kw))
                from aas_enhancement_tpu.labels import LABELS
                return "".join(LABELS[i] for i in r[0])
            return beam_decode(lp, beam_width=width, **kw)[0]
        return fn

    def _python_kwargs(kw):
        # beam_search_python shares beam_decode's LM prep: reuse beam_decode's
        # arg translation by exporting here exactly once per call (matching
        # the native path's per-call export cost).
        out = dict(lm_table=None, lm_order=0, lm_alpha=0.0, lm_beta=0.0,
                   word_ex=None, word_alpha=0.0, word_beta=0.0)
        lm = kw.get("lm")
        if lm is not None:
            if getattr(lm, "is_word_lm", False):
                out.update(word_ex=lm.export_native(),
                           word_alpha=kw["lm_alpha"], word_beta=kw["lm_beta"])
            else:
                out.update(lm_table=lm.dense_table(), lm_order=lm.order,
                           lm_alpha=kw["lm_alpha"], lm_beta=kw["lm_beta"])
        wl = kw.get("word_lm")
        if wl is not None:
            out.update(word_ex=wl.export_native(),
                       word_alpha=kw["word_alpha"], word_beta=kw["word_beta"])
        return out

    impls = ["native"] if native else []
    impls.append("python")
    for impl in impls:
        n = len(lps) if impl == "native" else min(args.python_max_utts, len(lps))
        for width in (16, 32, 64):
            for fusion in ("none", "char", "word", "hybrid"):
                key = f"beam{width}_{fusion}_{impl}"
                r = time_host_decoder(leg_fn(impl, width, fusion),
                                      lps[:n], lens[:n], refs[:n])
                r["n_utts"] = n
                result["legs"][key] = r
                print(key, r, flush=True)

    # --- Batched native decode (thread-parallel C++ over utterances): the
    # production eval path (`beam_decode` on [B, T, V] uses it when the
    # library carries ctc_beam_search_batch).  Id-exact with per-utterance
    # calls; on multi-core hosts the speedup is ~min(cores, B) — this
    # machine's core count is recorded so the number reads honestly.
    if native:
        t_max = max(lens)
        lp_pad = np.full((len(lps), t_max, lps[0].shape[1]), -30.0, np.float32)
        for i, (a, tl) in enumerate(zip(lps, lens)):
            lp_pad[i, :tl] = a[:tl]
        lens_arr = np.asarray(lens, np.int32)
        for width in (16, 64):
            for fusion in ("none", "hybrid"):
                ca, cb = weights["char"][:2]
                ha, hb, hwa, hwb = weights["hybrid"]
                kw = {}
                if fusion == "hybrid":
                    kw = dict(lm=clm, lm_alpha=ha, lm_beta=hb,
                              word_lm=wlm, word_alpha=hwa, word_beta=hwb)
                t0 = time.perf_counter()
                hyps = beam_decode(lp_pad, lens_arr, beam_width=width, **kw)
                wall = time.perf_counter() - t0
                key = f"beam{width}_{fusion}_native_batch"
                result["legs"][key] = {
                    "utts_per_s": round(len(lps) / wall, 2),
                    "wer": round(corpus_wer(refs, hyps), 4),
                    "n_utts": len(lps), "threads": "hw_concurrency"}
                print(key, result["legs"][key], flush=True)
        import multiprocessing
        result["host_cores"] = multiprocessing.cpu_count()

    # --- Live-session final rescore at the deployment point: one utterance's
    # accumulated log-probs, beam 64 hybrid (cli/serve.py transcribe mode).
    j = int(np.argsort(lens)[len(lens) // 2])  # median-length utterance
    ha, hb, hwa, hwb = weights["hybrid"]
    t0 = time.perf_counter()
    beam_decode(lps[j][:lens[j]], beam_width=64, lm=clm, lm_alpha=ha,
                lm_beta=hb, word_lm=wlm, word_alpha=hwa, word_beta=hwb)
    result["final_rescore_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    result["final_rescore_audio_s"] = round(lens[j] / frames_per_s, 2)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "legs"}))


if __name__ == "__main__":
    main()
