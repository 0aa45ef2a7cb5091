"""Device (TPU) batched beam search vs host C++ beam: the decode-bound-eval
crossover (VERDICT r4 #3).

decode_bench_r4.json measured the host stack: on this 1-core host the C++
decoder does ~36 utts/s at the beam-32 hybrid production point while the chip
enhances at 6675x real-time — bulk eval is decode-bound.  This bench runs the
SAME workload shape (B utterances of T AM frames, beam 32, prune 16, char
trigram fusion) through decode/device_beam.py as ONE jitted XLA program on
the accelerator and through the C++ thread-pool batch entry on the host.

Logits are generated ON-DEVICE (CLAUDE.md: host batches pay the ~10-47 MB/s
tunnel; real eval logits are already device-resident, so the device decoder's
input transfer cost is zero by construction — the C++ path is charged the
device->host fetch it actually requires).

Writes device_beam_bench_r5.json: utts/s for both paths at B=48, plus a B=1
row (the latency point) and a no-LM leg.
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--frames", type=int, default=400,
                   help="AM frames (~8 s utterances at 50 fps)")
    p.add_argument("--beam-width", type=int, default=32)
    p.add_argument("--prune-k", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="device_beam_bench_r5.json")
    args = p.parse_args()

    from aas_enhancement_tpu.utils import jax_cache
    jax_cache.enable()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from aas_enhancement_tpu.decode.beam import beam_search_native_batch
    from aas_enhancement_tpu.decode.device_beam import device_beam_decode_raw
    from aas_enhancement_tpu.decode.lm import CharNGramLM
    from aas_enhancement_tpu.labels import LABELS

    v = len(LABELS)
    b, t = args.batch, args.frames

    # CTC-shaped synthetic logits, generated on-device: peaked, blank-heavy.
    key = jax.random.key(7)
    logits = 3.0 * jax.random.normal(key, (b, t, v), jnp.float32)
    logits = logits.at[:, :, 0].add(
        2.0 * (jax.random.uniform(jax.random.key(8), (b, t)) < 0.6))
    lp_dev = jax.jit(lambda x: jax.nn.log_softmax(x, -1))(logits)
    float(lp_dev.ravel()[0])  # force materialization on device
    lens = np.full((b,), t, np.int32)

    lm = CharNGramLM(order=3).fit_texts(
        ["the quick brown fox jumps over the lazy dog",
         "she sells sea shells by the sea shore"] * 4)
    table = lm.dense_table()

    result = {"batch": b, "frames": t, "beam_width": args.beam_width,
              "prune_k": args.prune_k, "vocab": v,
              "host_cores": _os.cpu_count()}

    def time_device(tag, **kw):
        # warm (compile)
        t0 = time.time()
        device_beam_decode_raw(lp_dev, lens, beam_width=args.beam_width,
                               prune_k=args.prune_k, **kw)
        result[f"device_{tag}_compile_s"] = round(time.time() - t0, 2)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            ids, ol, sc = device_beam_decode_raw(
                lp_dev, lens, beam_width=args.beam_width,
                prune_k=args.prune_k, **kw)
            best = min(best, time.time() - t0)
        result[f"device_{tag}_s"] = round(best, 3)
        result[f"device_{tag}_utts_per_s"] = round(b / best, 1)
        return ids, ol

    def time_host(tag, **kw):
        # Charge the C++ path its real device->host fetch.
        t0 = time.time()
        lp_host = np.asarray(lp_dev)
        fetch = time.time() - t0
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            out = beam_search_native_batch(
                lp_host, lens, beam_width=args.beam_width,
                prune_k=args.prune_k, **kw)
            best = min(best, time.time() - t0)
        result[f"host_{tag}_fetch_s"] = round(fetch, 3)
        result[f"host_{tag}_s"] = round(best, 3)
        result[f"host_{tag}_utts_per_s"] = round(b / (best + fetch), 1)
        return out

    # --- no-LM leg
    ids_d, ol_d = time_device("nolm")
    host_nolm = time_host("nolm")
    # --- char trigram fusion leg (the device decoder's production mode)
    ids_l, ol_l = time_device("charlm", lm_table=table, lm_order=3,
                              lm_alpha=0.6, lm_beta=0.1)
    host_lm = time_host("charlm", lm_table=table, lm_order=3,
                        lm_alpha=0.6, lm_beta=0.1)

    # Parity spot-check on the bench tensors (ids must agree with the host
    # decoder row-for-row; ties under f32 may differ — count them).
    def agree(dev_ids, dev_lens, host_out):
        n = 0
        for r in range(b):
            d = list(dev_ids[r, : dev_lens[r]])
            h = list(host_out[r][0])
            n += d == h
        return n

    result["parity_nolm"] = f"{agree(ids_d, ol_d, host_nolm)}/{b}"
    result["parity_charlm"] = f"{agree(ids_l, ol_l, host_lm)}/{b}"

    # --- B=1 latency point (device pays the fixed program overhead alone)
    one = lp_dev[:1]
    device_beam_decode_raw(one, lens[:1], beam_width=args.beam_width,
                           prune_k=args.prune_k)
    t0 = time.time()
    device_beam_decode_raw(one, lens[:1], beam_width=args.beam_width,
                           prune_k=args.prune_k)
    result["device_b1_s"] = round(time.time() - t0, 3)

    result["speedup_charlm"] = round(
        result["device_charlm_utts_per_s"] / result["host_charlm_utts_per_s"],
        2)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
