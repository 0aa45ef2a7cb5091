"""TPU-efficient convolution variants.

Space-to-depth stride-2 conv (round-2 profiling, BASELINE.md): the acoustic
model's first conv has ONE input channel and stride (2, 2) — XLA's TPU conv
leaves the MXU's input-channel lanes nearly empty and runs at a few percent of
peak.  Folding the two stride-2 axes into 4 input channels turns it into a
stride-1 conv with C_in=4 over a half-resolution grid — the standard TPU "conv
stem" optimization — measured ~3x faster fwd+bwd at the bench shape.

The module is weight-compatible with flax nn.Conv (params `kernel` [kh, kw, 1,
C] and `bias` [C]), so checkpoints and golden parameter counts are unchanged;
the fold is a pure reshape of data and weights at apply time and the math is
identical up to bf16 summation order.
"""

from __future__ import annotations

import functools
import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _same_pad(size: int, k: int, s: int) -> tuple[int, int]:
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


class SpaceToDepthConv(nn.Module):
    """nn.Conv(features, kernel_size, strides=(2, 2), padding="SAME") for
    single-channel input [B, T, F, 1], evaluated as a stride-1 conv on the
    2x2-space-to-depth folded signal."""

    features: int
    kernel_size: tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        assert x.shape[-1] == 1, "space-to-depth fold expects C_in == 1"
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        b, t, f, _ = x.shape
        out_t, out_f = -(-t // 2), -(-f // 2)
        (pt_lo, pt_hi), (pf_lo, pf_hi) = _same_pad(t, kh, 2), _same_pad(f, kw, 2)
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (pt_lo, pt_hi), (pf_lo, pf_hi), (0, 0)))
        xp = jnp.pad(xp, ((0, 0), (0, (-xp.shape[1]) % 2),
                          (0, (-xp.shape[2]) % 2), (0, 0)))
        ht, hf = xp.shape[1] // 2, xp.shape[2] // 2
        # channel = 2*(t parity) + (f parity)
        z = (xp.reshape(b, ht, 2, hf, 2)
             .transpose(0, 1, 3, 2, 4).reshape(b, ht, hf, 4))

        # kernel tap (dt, df) -> position (dt//2, df//2), channel 2*(dt%2)+(df%2)
        wp = jnp.pad(kernel, ((0, kh % 2), (0, kw % 2), (0, 0), (0, 0)))
        khh, khw = wp.shape[0] // 2, wp.shape[1] // 2
        wz = (wp.reshape(khh, 2, khw, 2, self.features)
              .transpose(0, 2, 1, 3, 4).reshape(khh, khw, 4, self.features))

        y = jax.lax.conv_general_dilated(
            z, wz.astype(self.dtype), window_strides=(1, 1),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :out_t, :out_f] + bias.astype(self.dtype)


# ---------------------------------------------------------------------------
# Tap-packed dW conv: XLA forward + XLA dx, Pallas tap-packed weight gradient.
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    dev = jax.devices()[0]
    return "tpu" in (dev.platform + " " + getattr(dev, "device_kind", "")).lower()


def _nhwc_conv(x, w, strides):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# --- Polyphase dx for stride-(1, 2) SAME convs -----------------------------
#
# XLA computes dx of a strided conv as an lhs-DILATED transposed conv: dy is
# zero-stuffed to the input resolution, so half the MACs hit structural zeros
# and the dilated schedule tiles poorly (measured 24.1 ms vs the stride-1
# transposed conv's ~17.8 ms for the same useful FLOPs on AM.conv2 —
# BASELINE.md conv microbench).  The polyphase decomposition removes the
# dilation: dx positions of each frequency PARITY touch a disjoint half of the
# kernel taps, so dx = interleave(conv(dy, w_even), conv(dy, w_odd)) — two
# ordinary stride-1 convs over the Fo-resolution dy, zero wasted multiplies.


def _phasedx_supported(w_shape, strides) -> bool:
    return strides[0] == 1 and strides[1] == 2


def conv_dx_phase_split(dy: jnp.ndarray, w: jnp.ndarray,
                        x_shape: tuple[int, ...],
                        strides: tuple[int, int]) -> jnp.ndarray:
    """dx of `lax.conv_general_dilated(x, w, strides, "SAME", NHWC/HWIO)` for
    strides (1, 2), as two stride-1 convs (one per output-frequency parity).

    Forward: y[to, fo] = sum_{kt, kf} x[to + kt - pt_lo, 2*fo + kf - pf_lo] w[kt, kf]
    so dx[t, f] sums dy[fo] w[kf] over fo = (f + pf_lo - kf)/2 — integral only
    when kf == (f + pf_lo) mod 2.  For each parity p of f the surviving taps
    are w[:, r::2] with r = (p + pf_lo) % 2, and fo = g + c_p - j runs linearly
    in the phase position g = f//2: an ordinary correlation of dy with the
    (spatially reversed, I/O-transposed) phase kernel.  Exact in f32; equal to
    XLA's dx up to summation order otherwise.
    """
    kt_, kf_, ci, co = w.shape
    b, t, f, _ = x_shape
    to, fo = dy.shape[1], dy.shape[2]
    pt_lo, pt_hi = _same_pad(t, kt_, 1)
    pf_lo, _pf_hi = _same_pad(f, kf_, 2)

    # Time axis (stride 1): standard transposed conv = correlation with the
    # t-reversed kernel under flipped padding.
    pad_t = (kt_ - 1 - pt_lo, kt_ - 1 - pt_hi)

    phases = []
    g0 = (f + 1) // 2
    for p in (0, 1):
        r = (p + pf_lo) % 2
        taps = w[::-1, r::2]                       # [kt, Jp, ci, co]
        jp = taps.shape[1]
        gp = (f - p + 1) // 2                      # # of dx positions, parity p
        if jp == 0:
            phases.append(jnp.zeros((b, t, g0, ci), dy.dtype))
            continue
        c_p = (p + pf_lo - r) // 2
        pad_lo = jp - 1 - c_p
        pad_hi = gp - fo - pad_lo + jp - 1
        ker = jnp.swapaxes(taps[:, ::-1], 2, 3)    # [kt, Jp, co, ci]
        dxp = jax.lax.conv_general_dilated(
            dy, ker.astype(dy.dtype), window_strides=(1, 1),
            padding=(pad_t, (pad_lo, pad_hi)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if gp < g0:                                # odd F: one fewer odd slot
            dxp = jnp.pad(dxp, ((0, 0), (0, 0), (0, g0 - gp), (0, 0)))
        phases.append(dxp)

    out = jnp.stack(phases, axis=3).reshape(b, t, 2 * g0, ci)
    return out[:, :, :f]


def conv_dx_phase_fused(dy: jnp.ndarray, w: jnp.ndarray,
                        x_shape: tuple[int, ...],
                        strides: tuple[int, int]) -> jnp.ndarray:
    """Same dx as `conv_dx_phase_split`, but as ONE stride-1 conv.

    The two parity phases are stacked along the OUTPUT-channel dim (channel
    index = parity * ci + c), so the interleave back to input resolution is a
    contiguous reshape [B,T,G,2*ci] -> [B,T,G,2,ci] -> [B,T,2G,ci] — free,
    unlike the split version's stack(axis=3) shuffle — and the conv's output
    width doubles to 2*ci, filling more MXU lanes.  Phase kernels are aligned
    to a common left padding by zero-tap shifts (<= 1 extra tap column), so
    the MAC count stays ~half of XLA's lhs-dilated transposed conv.
    """
    kt_, kf_, ci, co = w.shape
    b, t, f, _ = x_shape
    fo = dy.shape[2]
    pt_lo, pt_hi = _same_pad(t, kt_, 1)
    pf_lo, _pf_hi = _same_pad(f, kf_, 2)
    pad_t = (kt_ - 1 - pt_lo, kt_ - 1 - pt_hi)
    g0 = (f + 1) // 2

    kers, los = [], []
    for p in (0, 1):
        r = (p + pf_lo) % 2
        taps = w[::-1, r::2]                       # [kt, Jp, ci, co]
        c_p = (p + pf_lo - r) // 2
        kers.append(jnp.swapaxes(taps[:, ::-1], 2, 3))   # [kt, Jp, co, ci]
        los.append(taps.shape[1] - 1 - c_p)
    lo = max(los)
    J = max(k.shape[1] + (lo - plo) for k, plo in zip(kers, los))
    parts = [jnp.pad(k, ((0, 0), (lo - plo, J - (lo - plo) - k.shape[1]),
                         (0, 0), (0, 0)))
             for k, plo in zip(kers, los)]
    ker = jnp.concatenate(parts, axis=3)           # [kt, J, co, 2*ci]

    out = jax.lax.conv_general_dilated(
        dy, ker.astype(dy.dtype), window_strides=(1, 1),
        padding=(pad_t, (lo, g0 - fo - lo + J - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [b, t, g0, 2*ci]
    return out.reshape(b, t, 2 * g0, ci)[:, :, :f]


def conv2d_freq_fold(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-(1,2) NHWC conv evaluated as a STRIDE-1 conv on the
    frequency space-to-depth folded signal.

    x [B,T,F,ci] is padded to even F and reshaped to [B,T,G,2*ci] (contiguous
    — free), G = ceil(F/2), folded channel = parity*ci + c; the [kt,kf,ci,co]
    kernel is regrouped by frequency-tap parity into [kt,J,2*ci,co] with
    J = ceil((kf+1)/2).  The stride disappears entirely, so the conv's
    autodiff backward is also stride-1: dx needs no lhs dilation (the fold is
    the same reformulation `conv_dx_phase_fused` applies to dy, now applied
    once to the primal) and dW runs with 2*ci=64 input-channel lanes — the
    lane-starved dimension of the measured ~4.5x-off dW (BASELINE.md).  No
    custom VJP: gradients flow through the fold reshapes, and dW is
    reconstructed to [kt,kf,ci,co] by the kernel-fold transpose (kernel-sized,
    negligible).  Equal to `lax.conv` up to f32 summation order (the parity
    pair joins the channel reduction).
    """
    kt_, kf_, ci, co = w.shape
    b, t, f, _ = x.shape
    pt = _same_pad(t, kt_, 1)
    pf_lo, _pf_hi = _same_pad(f, kf_, 2)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, (-f) % 2), (0, 0)))
    g = xp.shape[2] // 2
    xf = xp.reshape(b, t, g, 2 * ci)

    # Tap kf lands at folded offset (kf - pf_lo - p)//2 in parity slot
    # p = (kf - pf_lo) % 2; each parity's taps w[:, r::2] occupy consecutive
    # folded offsets starting at e_p.
    groups = []
    for p in (0, 1):
        r = (pf_lo + p) % 2
        groups.append(((r - pf_lo - p) // 2, w[:, r::2]))
    occupied = [(e, e + taps.shape[1] - 1) for e, taps in groups
                if taps.shape[1]]
    j_min = min(lo for lo, _ in occupied)
    J = max(hi for _, hi in occupied) - j_min + 1
    parts = []
    for e, taps in groups:
        if taps.shape[1] == 0:
            parts.append(jnp.zeros((kt_, J, ci, co), w.dtype))
        else:
            lo = e - j_min
            parts.append(jnp.pad(taps, ((0, 0), (lo, J - lo - taps.shape[1]),
                                        (0, 0), (0, 0))))
    wf = jnp.concatenate(parts, axis=2)            # [kt, J, 2*ci, co]

    return jax.lax.conv_general_dilated(
        xf, wf.astype(xf.dtype), window_strides=(1, 1),
        padding=(pt, (-j_min, J - 1 + j_min)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_tapdw(x: jnp.ndarray, w: jnp.ndarray, strides: tuple[int, int],
                 dw_impl: str = "auto", dx_impl: str = "xla") -> jnp.ndarray:
    """SAME-padded NHWC conv with replaceable backward implementations.

    The primal is bit-identical to lax conv; the gradients differ only in
    summation ORDER (same f32 accumulation).
    dw_impl: "auto" (tap-packed Pallas on TPU when the shape qualifies),
      "xla", "pallas" — measured NEGATIVE on production shapes (BASELINE.md),
      kept as a tested artifact.
    dx_impl: "xla", "phase_split" (two convs + interleave), or "phase_fused"
      (one channel-stacked conv) — polyphase stride-(1,2) dx variants above.
    """
    return _nhwc_conv(x, w, strides)


def _tapdw_supported(w_shape, strides) -> bool:
    kt, kf, ci, _ = w_shape
    return strides[0] == 1 and strides[1] in (1, 2) and ci >= 8


def _conv2d_tapdw_fwd(x, w, strides, dw_impl, dx_impl):
    return _nhwc_conv(x, w, strides), (x, w)


def _conv2d_tapdw_bwd(strides, dw_impl, dx_impl, res, dy):
    from aas_enhancement_tpu.ops.pallas.conv_dw_kernel import conv_dw_same

    import os

    x, w = res
    # AAS_PHASEDX=0 forces the XLA dx — same-session A/B anchor.
    if (dx_impl in ("phase_split", "phase_fused")
            and _phasedx_supported(w.shape, strides)
            and os.environ.get("AAS_PHASEDX", "1") != "0"):
        fn = (conv_dx_phase_fused if dx_impl == "phase_fused"
              else conv_dx_phase_split)
        dx = fn(dy, w, x.shape, strides)
    else:
        dx = jax.vjp(lambda x_: _nhwc_conv(x_, w, strides), x)[1](dy)[0]
    # AAS_TAPDW=0 forces the XLA dW everywhere — the same-session A/B anchor
    # for full-step measurements (BASELINE.md round-3 protocol).
    use_pallas = (os.environ.get("AAS_TAPDW", "1") != "0"
                  and (dw_impl == "pallas"
                       or (dw_impl == "auto" and _on_tpu())))
    if use_pallas and _tapdw_supported(w.shape, strides):
        dw = conv_dw_same(x, dy, w.shape[0], w.shape[1], strides,
                          interpret=not _on_tpu())
    else:
        dw = jax.vjp(lambda w_: _nhwc_conv(x, w_, strides), w)[1](dy)[0]
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv2d_tapdw.defvjp(_conv2d_tapdw_fwd, _conv2d_tapdw_bwd)


class TapDWConv(nn.Module):
    """Drop-in for nn.Conv(features, kernel_size, strides, padding="SAME")
    with the tap-packed Pallas dW backward.  Weight-compatible with nn.Conv
    (params `kernel` [kh, kw, ci, co] and `bias` [co]), so checkpoints are
    unchanged."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32
    dw_impl: str = "auto"        # "auto" | "xla" | "pallas"
    dx_impl: str = "xla"         # "xla" | "phase_split" | "phase_fused"
    impl: str = "custom_vjp"     # "custom_vjp" | "freq_fold" (stride (1,2))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dtype = jnp.dtype(self.dtype)
        # AAS_FREQFOLD=0 restores the custom_vjp path (same-session A/B
        # anchor); read at trace time like the other conv gates.
        if (self.impl == "freq_fold" and tuple(self.strides) == (1, 2)
                and os.environ.get("AAS_FREQFOLD", "1") != "0"):
            y = conv2d_freq_fold(x.astype(dtype), kernel.astype(dtype))
        else:
            y = conv2d_tapdw(x.astype(dtype), kernel.astype(dtype),
                             tuple(self.strides), self.dw_impl, self.dx_impl)
        return y + bias.astype(dtype)
