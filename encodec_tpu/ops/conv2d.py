"""2-D convolution with torch-style symmetric padding + weight norm.

Used by the MS-STFT discriminator (reference NormConv2d, conv.py:132-147).
Activations are `[B, H, W, C]` (NHWC), weights `[kh, kw, Cin, Cout]` (HWIO).
"""

from __future__ import annotations

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
           padding: tp.Tuple[int, int] = (0, 0), precision=None) -> Array:
    """x: [B, H, W, C]; symmetric torch-style padding (pad_h, pad_w).

    Weight-norm/spectral-norm reparameterizations are resolved in f32 from
    the master params, then cast once to the activation dtype — mixed
    precision (bf16 activations) keeps f32 masters, like ops.conv.
    """
    w = _weight2d(p).astype(x.dtype)
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
