"""Conv weight-gradient (dW) microbenchmark — the last single-chip lever.

BASELINE.md round-2 trace: conv dW is the only component left measured at
>2x off MXU peak (~15 ms of the 214 ms step recoverable at Pallas-conv
complexity).  This measures each production conv's forward / dW / dx as its
own warm jitted program and prints achieved vs roofline times, so the
decision to build (or skip) a custom conv kernel is a recorded measurement
(VERDICT r2 #6).

Roofline per conv: time >= max(FLOPs / 197e12 bf16, bytes / 819e9).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aas_enhancement_tpu.utils import jax_cache
jax_cache.enable()

PEAK_FLOPS = 197e12      # v5e bf16
HBM_BW = 819e9


def _sync(out):
    # Device-side index, then fetch ONE element: block_until_ready does not
    # sync through the axon tunnel, and np.asarray would pull the whole ~1 GB
    # tensor across it.
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)   # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_conv(name, b, t, f, cin, cout, kt, kf, strides=(1, 1),
               dtype=jnp.bfloat16):
    # Operands are generated ON DEVICE (the activation tensors are ~1 GB each;
    # feeding them through the 14-47 MB/s axon tunnel would dominate the
    # benchmark wall by hours).
    key = jax.random.key(0)
    kx, kw, kd = jax.random.split(key, 3)
    mk = jax.jit(lambda k, shape: jax.random.normal(k, shape, dtype) * 0.1,
                 static_argnums=1)
    x = mk(kx, (b, t, f, cin))
    w = mk(kw, (kt, kf, cin, cout))

    def conv(x_, w_):
        # Pure-bf16 in/out, as in the production step (MXU still accumulates
        # f32 internally); keeps VJP cotangent dtypes consistent.
        return jax.lax.conv_general_dilated(
            x_, w_, window_strides=strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    to, fo = -(-t // strides[0]), -(-f // strides[1])
    dy = mk(kd, (b, to, fo, cout))

    fwd_ms = timeit(jax.jit(conv), x, w)
    dw_ms = timeit(jax.jit(lambda x_, dy_: jax.vjp(lambda w_: conv(x_, w_),
                                                   w)[1](dy_)[0]), x, dy)
    dx_ms = timeit(jax.jit(lambda w_, dy_: jax.vjp(lambda x_: conv(x_, w_),
                                                   x)[1](dy_)[0]), w, dy)

    # Tap-packed Pallas dW (ops/pallas/conv_dw_kernel) where supported.
    pl_dw_ms = None
    if strides[0] == 1 and strides[1] in (1, 2) and cin >= 8:
        from aas_enhancement_tpu.ops.pallas.conv_dw_kernel import conv_dw_same
        fn = jax.jit(lambda x_, dy_: conv_dw_same(x_, dy_, kt, kf, strides))
        try:
            pl_dw_ms = timeit(fn, x, dy)
        except Exception as e:  # record lowering failures, don't die
            pl_dw_ms = f"FAIL {type(e).__name__}"

    # Polyphase dx (ops/conv.conv_dx_phase_*) for stride-(1,2) convs.
    ps_dx_ms = pf_dx_ms = None
    if strides == (1, 2):
        from aas_enhancement_tpu.ops.conv import (conv_dx_phase_fused,
                                                  conv_dx_phase_split)
        fn = jax.jit(lambda dy_, w_: conv_dx_phase_split(
            dy_, w_, (b, t, f, cin), strides))
        ps_dx_ms = timeit(fn, dy, w)
        fn2 = jax.jit(lambda dy_, w_: conv_dx_phase_fused(
            dy_, w_, (b, t, f, cin), strides))
        pf_dx_ms = timeit(fn2, dy, w)

    flops = 2.0 * b * to * fo * kt * kf * cin * cout
    bytes_x = x.size * x.dtype.itemsize
    bytes_dy = dy.size * dy.dtype.itemsize
    ideal = lambda fl, by: max(fl / PEAK_FLOPS, by / HBM_BW) * 1000.0
    row = {
        "conv": name,
        "shape": f"[{b},{t},{f},{cin}]x({kt}x{kf})->{cout} s{strides}",
        "fwd_ms": round(fwd_ms, 2),
        "fwd_ideal_ms": round(ideal(flops, bytes_x + bytes_dy), 2),
        "dw_ms": round(dw_ms, 2),
        "dw_ideal_ms": round(ideal(flops, bytes_x + bytes_dy), 2),
        "dx_ms": round(dx_ms, 2),
        "gflop": round(flops / 1e9, 1),
    }
    row["dw_off_peak_x"] = round(row["dw_ms"] / max(row["dw_ideal_ms"], 1e-6), 2)
    if pl_dw_ms is not None:
        row["pallas_dw_ms"] = (round(pl_dw_ms, 2)
                               if isinstance(pl_dw_ms, float) else pl_dw_ms)
    if ps_dx_ms is not None:
        row["phase_split_dx_ms"] = round(ps_dx_ms, 2)
    if pf_dx_ms is not None:
        row["phase_fused_dx_ms"] = round(pf_dx_ms, 2)
    if strides == (1, 2):
        # Fully folded formulation: fwd + autodiff dx/dW of conv2d_freq_fold.
        from aas_enhancement_tpu.ops.conv import conv2d_freq_fold
        row["fold_fwd_ms"] = round(timeit(jax.jit(conv2d_freq_fold), x, w), 2)
        row["fold_dx_ms"] = round(timeit(jax.jit(
            lambda x_, w_, dy_: jax.vjp(conv2d_freq_fold, x_, w_)[1](dy_)[0]),
            x, w, dy), 2)
        row["fold_dw_ms"] = round(timeit(jax.jit(
            lambda x_, w_, dy_: jax.vjp(conv2d_freq_fold, x_, w_)[1](dy_)[1]),
            x, w, dy), 2)
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [
        # Enhancer conv stems at B=128 x 8 s (T=801, F=161, C=32).
        bench_conv("G.conv0", 128, 801, 161, 1, 32, 5, 5),
        bench_conv("G.conv1", 128, 801, 161, 32, 32, 5, 5),
        # AM conv2 (post conv1 stride-2: T=401, F=81).  The s(1,1) row is the
        # round-3 recorded comparison point; the s(1,2) row is the conv the
        # production step actually runs.
        bench_conv("AM.conv2", 128, 401, 81, 32, 32, 11, 21),
        bench_conv("AM.conv2.real", 128, 401, 81, 32, 32, 11, 21,
                   strides=(1, 2)),
    ]
    total_dw = sum(r["dw_ms"] for r in rows)
    total_dw_ideal = sum(r["dw_ideal_ms"] for r in rows)
    print(json.dumps({"total_dw_ms": round(total_dw, 2),
                      "total_dw_ideal_ms": round(total_dw_ideal, 2),
                      "recoverable_ms": round(total_dw - total_dw_ideal, 2)}))


if __name__ == "__main__":
    main()
