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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_tapdw(x: jnp.ndarray, w: jnp.ndarray, strides: tuple[int, int],
                 dw_impl: str = "auto") -> jnp.ndarray:
    """SAME-padded NHWC conv whose backward computes dW with the tap-packed
    Pallas kernel (ops/pallas/conv_dw_kernel.py) when supported.

    Forward and dx are XLA's native conv ops (measured at/near roofline
    in-step, BASELINE.md); only dW — the one >2x-off-peak component — is
    replaced.  The primal is bit-identical to lax conv; only the weight
    gradient's summation ORDER differs (same f32 accumulation).
    dw_impl: "auto" (Pallas on TPU when the shape qualifies), "xla", "pallas".
    """
    return _nhwc_conv(x, w, strides)


def _tapdw_supported(w_shape, strides) -> bool:
    kt, kf, ci, _ = w_shape
    return strides[0] == 1 and strides[1] in (1, 2) and ci >= 8


def _conv2d_tapdw_fwd(x, w, strides, dw_impl):
    return _nhwc_conv(x, w, strides), (x, w)


def _conv2d_tapdw_bwd(strides, dw_impl, res, dy):
    from aas_enhancement_tpu.ops.pallas.conv_dw_kernel import conv_dw_same

    import os

    x, w = res
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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dtype = jnp.dtype(self.dtype)
        y = conv2d_tapdw(x.astype(dtype), kernel.astype(dtype),
                         tuple(self.strides), self.dw_impl)
        return y + bias.astype(dtype)
