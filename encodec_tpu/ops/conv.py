"""Streamable 1-D convolutions, transposed convolutions and norms.

TPU-first design notes
----------------------
* Activations are channels-last `[B, T, C]`; weights are `[K, Cin, Cout]`
  (WIO). XLA lowers this straight onto the MXU without layout transposes.
* Weight norm is kept in its `(v, g)` parameterization for training parity
  with the reference's optimizer dynamics and folded into a plain weight for
  inference (`fold_weight_norm`).
* All padding amounts are static python ints → no dynamic shapes under jit.

Behavioral reference: encodec/modules/conv.py (SConv1d 182-221,
SConvTranspose1d 224-263, NormConv wrappers 109-179) and
encodec/modules/norm.py (ConvLayerNorm).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

from .pad import get_extra_padding_for_conv1d, pad1d, unpad1d

Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]

_DIMENSION_NUMBERS = ("NTC", "TIO", "NTC")

CONV_NORMALIZATIONS = frozenset(
    ["none", "weight_norm", "spectral_norm", "layer_norm", "time_group_norm"]
)


# ---------------------------------------------------------------------------
# Initialization (matches torch.nn.Conv1d defaults: kaiming uniform a=sqrt(5),
# bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
# ---------------------------------------------------------------------------

def _conv_init(key, kernel_size: int, in_ch: int, out_ch: int, groups: int = 1,
               transposed: bool = False):
    wkey, bkey = jax.random.split(key)
    if transposed:
        # torch ConvTranspose1d weight: [Cin, Cout//groups, K]; fan_in uses
        # weight.size(1) * K = (out_ch // groups) * K
        fan_in = (out_ch // groups) * kernel_size
        shape = (kernel_size, in_ch, out_ch // groups)
    else:
        fan_in = (in_ch // groups) * kernel_size
        shape = (kernel_size, in_ch // groups, out_ch)
    gain = math.sqrt(2.0 / (1 + 5.0))  # kaiming_uniform with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(wkey, shape, jnp.float32, -bound, bound)
    b_bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(bkey, (out_ch,), jnp.float32, -b_bound, b_bound)
    return w, b


def _wn_axes(transposed: bool) -> tuple:
    """Axes reduced by weight-norm in WIO layout `[K, I, O]`.

    torch weight_norm defaults to dim=0 of the torch weight: per-Cout for
    Conv1d (`[Cout, Cin, K]`) but per-*Cin* for ConvTranspose1d
    (`[Cin, Cout, K]`) — an upstream quirk baked into the published
    checkpoints, so we preserve it.
    """
    return (0, 2) if transposed else (0, 1)


def _sn_matrix(w: Array) -> Array:
    """Spectral-norm matrix view `[O, I*K]` of a WIO/HWIO weight.

    torch.nn.utils.spectral_norm reshapes the torch weight with the output
    dim first and the rest flattened (dim=0 for Conv, dim=1 for
    ConvTranspose — both are Cout, which in our layouts is always the LAST
    axis) in torch's `[Cout, Cin, K...]` row-major order.
    """
    ndim = w.ndim
    perm = (ndim - 1,) + tuple(range(ndim - 1))
    if ndim == 3:                      # [K, I, O] → [O, I, K]
        perm = (2, 1, 0)
    elif ndim == 4:                    # [kh, kw, I, O] → [O, I, kh, kw]
        perm = (3, 2, 0, 1)
    return jnp.transpose(w, perm).reshape(w.shape[-1], -1)


def _sn_normalize(x: Array, eps: float = 1e-12) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_norm_power_iterate(params: Params, n_power_iterations: int = 1,
                                eps: float = 1e-12) -> Params:
    """One (or n) power-iteration update(s) of the spectral-norm `u`/`v`
    estimate — the training-mode side effect of torch's spectral_norm hook
    (ref conv.py:26-35 applies it via apply_parametrization_norm), made an
    explicit functional state update. Returns new params."""
    w_mat = _sn_matrix(params["w_orig"])
    u, v = params["u_sn"], params["v_sn"]
    for _ in range(n_power_iterations):
        v = _sn_normalize(w_mat.T @ u, eps)
        u = _sn_normalize(w_mat @ v, eps)
    out = dict(params)
    out["u_sn"], out["v_sn"] = u, v
    return out


def _spectral_weight(params: Params) -> Array:
    """Effective weight `w_orig / sigma` with sigma = u^T W v from the
    stored power-iteration state. u/v are buffers, not trainable: gradients
    are stopped through them (torch registers them as no-grad buffers), so
    only `w_orig` learns; the train steps refresh u/v with
    `spectral_norm_update_tree` each step (torch iterates every training
    forward)."""
    w = params["w_orig"]
    w_mat = _sn_matrix(w)
    u = jax.lax.stop_gradient(params["u_sn"])
    v = jax.lax.stop_gradient(params["v_sn"])
    sigma = jnp.dot(u, w_mat @ v)
    return w / sigma


def spectral_norm_update_tree(params):
    """Apply one power iteration to every spectral-norm leaf dict in a
    parameter pytree (identity when none exist — trace-time no-op). The
    train steps call this at the top of each step, matching torch's
    iterate-every-training-forward hook semantics."""
    if isinstance(params, dict):
        if "w_orig" in params and "u_sn" in params:
            return spectral_norm_power_iterate(params)
        return {k: spectral_norm_update_tree(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(spectral_norm_update_tree(v) for v in params)
    return params


def _init_spectral(params: Params, key, transposed: bool = False,
                   eps: float = 1e-12) -> Params:
    w = params.pop("w")
    w_mat = _sn_matrix(w)
    h, wd = w_mat.shape
    ku, kv = jax.random.split(jax.random.fold_in(key, 0x5eec))
    params["w_orig"] = w
    params["u_sn"] = _sn_normalize(jax.random.normal(ku, (h,), jnp.float32), eps)
    params["v_sn"] = _sn_normalize(jax.random.normal(kv, (wd,), jnp.float32), eps)
    return params


def _with_norm_params(params: Params, key, norm: str, w_shape, out_ch: int,
                      transposed: bool = False) -> Params:
    if norm == "weight_norm":
        v = params.pop("w")
        axes = _wn_axes(transposed)
        g = jnp.sqrt(jnp.sum(v * v, axis=axes))
        params["v"] = v
        params["g"] = g
    elif norm == "spectral_norm":
        params = _init_spectral(params, key, transposed)
    elif norm in ("layer_norm", "time_group_norm"):
        params["norm"] = {
            "scale": jnp.ones((out_ch,), jnp.float32),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
    return params


def init_sconv1d(key, in_ch: int, out_ch: int, kernel_size: int, *,
                 groups: int = 1, bias: bool = True, norm: str = "none") -> Params:
    assert norm in CONV_NORMALIZATIONS, norm
    w, b = _conv_init(key, kernel_size, in_ch, out_ch, groups)
    params: Params = {"w": w}
    if bias:
        params["b"] = b
    return _with_norm_params(params, key, norm, w.shape, out_ch)


def init_sconv_transpose1d(key, in_ch: int, out_ch: int, kernel_size: int, *,
                           bias: bool = True, norm: str = "none") -> Params:
    assert norm in CONV_NORMALIZATIONS, norm
    w, b = _conv_init(key, kernel_size, in_ch, out_ch, transposed=True)
    params: Params = {"w": w}
    if bias:
        params["b"] = b
    return _with_norm_params(params, key, norm, w.shape, out_ch, transposed=True)


# ---------------------------------------------------------------------------
# Weight norm
# ---------------------------------------------------------------------------

def _effective_weight(params: Params, transposed: bool = False) -> Array:
    """Return the conv weight, folding (v, g) weight-norm or the
    spectral-norm sigma estimate if present."""
    if "v" in params:
        v = params["v"]
        axes = _wn_axes(transposed)
        g = jnp.expand_dims(params["g"], axes)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        return g * v / norm
    if "w_orig" in params:
        return _spectral_weight(params)
    return params["w"]


def fold_weight_norm(params: Params, transposed: bool = False) -> Params:
    """Fold weight-norm (v, g) into a plain weight for inference."""
    if "v" in params:
        out = dict(params)
        w = _effective_weight(params, transposed)
        del out["v"], out["g"]
        out["w"] = w
        return out
    return params


# ---------------------------------------------------------------------------
# Norm layers (module-style norms applied after the conv)
# ---------------------------------------------------------------------------

def layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the channel axis of `[B, T, C]`, per time step.

    Equivalent to the reference's ConvLayerNorm (rearrange to time-major,
    nn.LayerNorm(C), rearrange back) without any transposes. Statistics
    accumulate in f32 regardless of the activation dtype (bf16-safe).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def time_group_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """GroupNorm(1, C) over `[B, T, C]`: normalize over (T, C) per item.
    Statistics accumulate in f32 (bf16-safe)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def _apply_norm(x: Array, params: Params, norm: str) -> Array:
    if norm == "layer_norm":
        return layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    if norm == "time_group_norm":
        return time_group_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return x


# ---------------------------------------------------------------------------
# Raw convolutions (no padding logic)
# ---------------------------------------------------------------------------

# Small-channel convs dispatch to the shift form when the per-output
# contraction is at most this many (Cin × Cout) MAC lanes. Measured on v5e
# (full 24 kHz decoder, B=32×1 s, HIGHEST): ≤512 is the sweet spot
# (21.3 → 10.3 ms); raising it to 2048 (pulling in the 64↔32 resblocks)
# regresses to 13.3 ms — those still want the MXU.
_SHIFT_LOWERING_MAX_CINCOUT = 512


def conv1d_shift(x: Array, w: Array, b: tp.Optional[Array] = None, *,
                 dilation: int = 1) -> Array:
    """Valid conv as a sum of K time-shifted slices — the VPU lowering.

    For tiny channel counts the MXU form is pathological: a [B·T, K·Cin] ×
    [K·Cin, Cout] contraction with Cout ∈ {1, 2, 16, 32} wastes up to
    127/128 of the systolic array's lanes, and f32 `Precision.HIGHEST`
    additionally pays 6-pass bf16 emulation. The shift form computes
    y[t] = Σ_dt x[t+dt·dilation] · w[dt] with K slice-multiply-adds that
    XLA fuses into one elementwise kernel on the VPU — *true* f32
    accumulation (no bf16 passes), no layout padding. Measured on the full
    24 kHz decoder (B=32×1 s, v5e): 21.3 → 10.3 ms end-to-end when the
    ≤512-lane convs take this path; isolated-op timings do NOT predict
    this (the win is mostly fusion — the conv barrier between elementwise
    producers/consumers disappears).

    Per-output summand order is (tap, channel), independent of position
    and length, so chunked-streaming == batch stays bit-exact, same as the
    MXU form. Not used on the encode path: codes must stay bit-identical
    to the reference, so the encoder keeps its audited MXU formulation.
    """
    k, cin, cout = w.shape
    T = x.shape[1] - (k - 1) * dilation
    acc = jnp.zeros((x.shape[0], T, cout), x.dtype)
    for dt in range(k):
        sl = jax.lax.dynamic_slice_in_dim(x, dt * dilation, T, axis=1)
        if cout == 1:
            acc = acc + (sl * w[dt, :, 0]).sum(-1, keepdims=True)
        else:
            acc = acc + jnp.einsum("btc,cd->btd", sl, w[dt],
                                   precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        acc = acc + b
    return acc


def conv1d(x: Array, w: Array, b: tp.Optional[Array] = None, *,
           stride: int = 1, dilation: int = 1, groups: int = 1,
           precision=None, lowering: str = "mxu") -> Array:
    """Valid (unpadded) 1-D convolution. x: [B, T, C], w: [K, Cin/g, Cout].

    `lowering="mxu"` (default) always uses `lax.conv_general_dilated`.
    `lowering="auto"` dispatches small-channel stride-1 f32 convs to
    `conv1d_shift` (see its docstring); used by the decoder, whose parity
    contract is float tolerance — never by the bit-exact encode path.
    """
    if (lowering == "auto" and stride == 1 and groups == 1
            and x.dtype == jnp.float32
            and w.shape[1] * w.shape[2] <= _SHIFT_LOWERING_MAX_CINCOUT):
        return conv1d_shift(x, w, b, dilation=dilation)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x: Array, w: Array, b: tp.Optional[Array] = None, *,
                     stride: int = 1, precision=None) -> Array:
    """Full (untrimmed) 1-D transposed convolution.

    x: [B, T, C], w: [K, Cin, Cout] (same layout a forward conv from Cin to
    Cout would use when *transposed*). Output length = (T-1)*stride + K,
    matching torch.nn.ConvTranspose1d with padding=0.

    Implemented as an input-dilated convolution with a spatially-flipped,
    io-swapped kernel — the formulation XLA pattern-matches to an efficient
    transposed conv on TPU.

    Measured dead end (round 3, do not retry): an explicit polyphase
    (sub-pixel) lowering — VALID conv with K/stride taps and stride·Cout
    channels, then phase-interleaving reshape — is *slower* on v5e despite
    doing stride× fewer nominal MACs. Full 24 kHz decoder, B=32×1 s,
    same-process A/B: 21.3 ms dilated vs 23.2 ms polyphase at HIGHEST,
    9.3-10.2 vs 13.0-13.4 ms at HIGH. XLA's TPU conv emitter already
    skips the inserted zeros in the lhs_dilated form, while the explicit
    pad + reshape pair adds HBM round-trips.
    """
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)  # [K, Cin, Cout] flipped in time
    y = jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# Streamable convs (padding contract + norm), the SConv1d/SConvTranspose1d
# equivalents.
# ---------------------------------------------------------------------------

def sconv1d(params: Params, x: Array, *, kernel_size: int, stride: int = 1,
            dilation: int = 1, groups: int = 1, causal: bool = False,
            norm: str = "none", pad_mode: str = "reflect",
            precision=None, lowering: str = "mxu") -> Array:
    """Conv1d with automatic causal/asymmetric padding (ref conv.py:202-221)."""
    if causal and norm == "time_group_norm":
        # whole-time statistics are not causally computable (ref conv.py:47)
        raise ValueError("GroupNorm doesn't support causal evaluation.")
    effective_k = (kernel_size - 1) * dilation + 1
    padding_total = effective_k - stride
    extra_padding = get_extra_padding_for_conv1d(
        x.shape[1], effective_k, stride, padding_total)
    if causal:
        x = pad1d(x, (padding_total, extra_padding), mode=pad_mode)
    else:
        padding_right = padding_total // 2
        padding_left = padding_total - padding_right
        x = pad1d(x, (padding_left, padding_right + extra_padding), mode=pad_mode)
    # weight math (weight-norm fold / spectral sigma) runs in the master
    # f32 params; the result is cast once to the activation dtype so bf16
    # activations hit the MXU in bf16 (mixed-precision training).
    w = _effective_weight(params).astype(x.dtype)
    b = params.get("b")
    b = None if b is None else b.astype(x.dtype)
    y = conv1d(x, w, b, stride=stride, dilation=dilation,
               groups=groups, precision=precision, lowering=lowering)
    return _apply_norm(y, params, norm)


def sconv_transpose1d(params: Params, x: Array, *, kernel_size: int,
                      stride: int = 1, causal: bool = False,
                      norm: str = "none", trim_right_ratio: float = 1.0,
                      precision=None) -> Array:
    """ConvTranspose1d that trims `kernel_size - stride` of implicit padding
    (causal: right-trim by `trim_right_ratio`; else asymmetric split).
    Ref conv.py:241-263."""
    assert causal or trim_right_ratio == 1.0
    if causal and norm == "time_group_norm":
        raise ValueError("GroupNorm doesn't support causal evaluation.")
    padding_total = kernel_size - stride
    w = _effective_weight(params, transposed=True).astype(x.dtype)
    b = params.get("b")
    b = None if b is None else b.astype(x.dtype)
    y = conv_transpose1d(x, w, b, stride=stride,
                         precision=precision)
    y = _apply_norm(y, params, norm)
    if causal:
        padding_right = math.ceil(padding_total * trim_right_ratio)
        padding_left = padding_total - padding_right
    else:
        padding_right = padding_total // 2
        padding_left = padding_total - padding_right
    return unpad1d(y, (padding_left, padding_right))
