"""2-D convolution with torch-style symmetric padding + weight norm.

Used by the MS-STFT discriminator (reference NormConv2d, conv.py:132-147).
Activations are `[B, H, W, C]` (NHWC), weights `[kh, kw, Cin, Cout]` (HWIO).
"""

from __future__ import annotations

import functools
import math
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]

_DN = ("NHWC", "HWIO", "NHWC")


def init_conv2d(key, in_ch: int, out_ch: int,
                kernel_size: tp.Tuple[int, int], *, norm: str = "none") -> Params:
    kh, kw = kernel_size
    fan_in = in_ch * kh * kw
    gain = math.sqrt(2.0 / 6.0)
    bound = gain * math.sqrt(3.0 / fan_in)
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, (kh, kw, in_ch, out_ch), jnp.float32,
                           -bound, bound)
    b_bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (out_ch,), jnp.float32, -b_bound, b_bound)
    p: Params = {"b": b}
    if norm == "weight_norm":
        # torch weight_norm dim=0 on [Cout, Cin, kh, kw]: per-out-channel
        p["v"] = w
        p["g"] = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2)))
    elif norm == "spectral_norm":
        from .conv import _init_spectral
        p["w"] = w
        p = _init_spectral(p, key)
    else:
        p["w"] = w
    return p


def _weight2d(p: Params) -> Array:
    if "v" in p:
        v = p["v"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
        return p["g"] * v / norm
    if "w_orig" in p:
        from .conv import _spectral_weight
        return _spectral_weight(p)
    return p["w"]


def conv2d(p: Params, x: Array, *, stride: tp.Tuple[int, int] = (1, 1),
           dilation: tp.Tuple[int, int] = (1, 1),
           padding: tp.Tuple[int, int] = (0, 0), precision=None,
           impl: str = "xla") -> Array:
    """x: [B, H, W, C]; symmetric torch-style padding (pad_h, pad_w).

    Weight-norm/spectral-norm reparameterizations are resolved in f32 from
    the master params, then cast once to the activation dtype — mixed
    precision (bf16 activations) keeps f32 masters, like ops.conv.

    `impl="taps"` keeps XLA's conv for the forward AND the input gradient
    (both regular convolutions — no pathological temps) but overrides the
    WEIGHT gradient with kh*kw plain `[Cin, Cout]` contractions over
    batch x space, one per kernel tap. XLA's conv-backward-filter
    materializes an im2col patch tensor — measured 17-35 GB on the MS-STFT
    discriminator's dilated 3x9 convs over 7,200-frame (4 h @ 10 Hz)
    spectrograms, an instant OOM — while the tap contractions reduce the
    same operands straight to `[3, 9, 32, 32]` with no intermediate. Opt in
    for long-sequence discriminator TRAINING; the default stays the pure
    XLA path. Values are identical (same forward); dw differs from the
    conv-backward-filter reduction order at float ulp level.
    """
    w = _weight2d(p).astype(x.dtype)
    if impl == "taps":
        y = _conv2d_tap_grad(x, w, stride, dilation, padding, precision)
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=stride,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            rhs_dilation=dilation,
            dimension_numbers=_DN,
            precision=precision,
        )
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def _raw_conv2d(x: Array, w: Array, stride, dilation, padding,
                precision=None) -> Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation, dimension_numbers=_DN, precision=precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv2d_tap_grad(x: Array, w: Array, stride, dilation, padding,
                     precision=None) -> Array:
    """XLA conv with a tap-decomposed weight gradient — see
    `conv2d(impl="taps")`."""
    return _raw_conv2d(x, w, stride, dilation, padding, precision)


def _tap_grad_fwd(x, w, stride, dilation, padding, precision):
    return (_raw_conv2d(x, w, stride, dilation, padding, precision),
            (x, w))


def _tap_grad_bwd(stride, dilation, padding, precision, res, ct):
    x, w = res
    # dx via XLA's conv-backward-input (a regular transposed conv); note
    # the RAW conv here — differentiating the custom_vjp-wrapped function
    # would re-enter this bwd rule and recurse forever.
    _, vjp_x = jax.vjp(
        lambda xx: _raw_conv2d(xx, w, stride, dilation, padding,
                               precision), x)
    dx, = vjp_x(ct)
    # dw[i, j] = <shifted_slice(x), ct> contracted over batch x space —
    # the operands already exist; the output is [Cin, Cout] per tap.
    kh, kw = w.shape[:2]
    sh, sw = stride
    dh, dw_ = dilation
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[0]),
                     (padding[1], padding[1]), (0, 0)))
    B = xp.shape[0]
    C = xp.shape[3]
    h_out, w_out = ct.shape[1], ct.shape[2]
    rows = []
    for i in range(kh):
        cols = []
        for j in range(kw):
            xs = jax.lax.slice(
                xp, (0, i * dh, j * dw_, 0),
                (B, i * dh + (h_out - 1) * sh + 1,
                 j * dw_ + (w_out - 1) * sw + 1, C),
                (1, sh, sw, 1))
            cols.append(jnp.einsum("bhwc,bhwd->cd", xs, ct,
                                   precision=precision))
        rows.append(jnp.stack(cols))
    dw = jnp.stack(rows).astype(w.dtype)                # [kh, kw, Cin, Cout]
    return dx, dw


_conv2d_tap_grad.defvjp(_tap_grad_fwd, _tap_grad_bwd)


def conv2d_params_from_torch(state, prefix: str, norm: str = "none") -> Params:
    """Convert reference NormConv2d `{prefix}conv.*` keys."""
    import numpy as np
    p: Params = {}
    if f"{prefix}conv.weight_v" in state:
        v = np.asarray(state[f"{prefix}conv.weight_v"], np.float32)
        g = np.asarray(state[f"{prefix}conv.weight_g"], np.float32)
        p["v"] = jnp.asarray(v.transpose(2, 3, 1, 0))   # [kh, kw, I, O]
        p["g"] = jnp.asarray(g.reshape(-1))
    else:
        w = np.asarray(state[f"{prefix}conv.weight"], np.float32)
        p["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    if f"{prefix}conv.bias" in state:
        p["b"] = jnp.asarray(np.asarray(state[f"{prefix}conv.bias"], np.float32))
    return p
