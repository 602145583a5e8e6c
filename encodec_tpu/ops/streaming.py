"""Streaming (chunked) causal convolution primitives.

The causal SEANet stack admits exact streaming: every causal conv only needs
`effective_kernel - stride` samples of left context, and every causal
transposed conv only needs to carry `kernel - stride` samples of
overlap-add tail. These functions thread that context as explicit
fixed-shape state, so a jitted chunk step compiles once and reproduces the
batch forward exactly on chunk boundaries that are multiples of the stride.

The reference never exposes a streaming API (its FAQ declines it,
README.md:208-211) — causality is its latent capability; this makes it a
first-class, jit-stable interface.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from .conv import _effective_weight, _apply_norm, conv1d, conv_transpose1d

Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]


def conv_stream_init(batch: int, in_ch: int, kernel_size: int, stride: int = 1,
                     dilation: int = 1, dtype=jnp.float32) -> Array:
    """Initial left-context for a causal conv: `padding_total` zeros — the
    same zeros `pad1d` would prepend in batch mode (pad_mode is irrelevant
    mid-stream; at stream start zero padding matches the reference's
    causal zero... note: batch mode uses `pad_mode` (reflect by default) at
    the very start, so use `prime_conv_stream` to match batch semantics on
    the first chunk)."""
    effective_k = (kernel_size - 1) * dilation + 1
    return jnp.zeros((batch, effective_k - stride, in_ch), dtype)


def sconv1d_stream(params: Params, x: Array, state: Array, *,
                   kernel_size: int, stride: int = 1, dilation: int = 1,
                   norm: str = "none", precision=None,
                   lowering: str = "mxu") -> tp.Tuple[Array, Array]:
    """One streaming step of a causal SConv1d.

    x: `[B, L, Cin]` with `L % stride == 0`; state: `[B, Ke - s, Cin]`.
    Returns `(y [B, L/s, Cout], new_state)`.

    `lowering` must match the batch path's (`ops.conv1d`): the dispatch
    predicate is shape-only and the shift form's summand order is
    position-independent, so streamed == batch stays bit-exact under
    either form — but only when both sides use the same one.
    """
    if norm == "time_group_norm":
        # streaming/sharded steps see a time slice; whole-time group-norm
        # statistics are not computable (and the combination is invalid
        # upstream anyway — ref conv.py:47 forbids causal group norm)
        raise ValueError("GroupNorm doesn't support causal evaluation.")
    effective_k = (kernel_size - 1) * dilation + 1
    ctx = effective_k - stride
    assert x.shape[1] % stride == 0, (x.shape, stride)
    full = jnp.concatenate([state, x], axis=1)
    # same mixed-precision contract as the batch sconv1d: weights/bias cast
    # to the activation dtype so bf16 streaming stays bf16 end-to-end
    w = _effective_weight(params).astype(x.dtype)
    b = params.get("b")
    y = conv1d(full, w, None if b is None else b.astype(x.dtype),
               stride=stride, dilation=dilation, precision=precision,
               lowering=lowering)
    y = _apply_norm(y, params, norm)
    new_state = full[:, full.shape[1] - ctx:] if ctx > 0 \
        else full[:, :0]
    return y, new_state


def prime_conv_stream(x_head: Array, kernel_size: int, stride: int = 1,
                      dilation: int = 1, pad_mode: str = "reflect") -> Array:
    """Build the stream-start left context that matches batch semantics:
    the batch forward pads the signal's *start* with `pad_mode` (reflect by
    default), not zeros. Given the first samples of the stream `x_head`
    (`[B, >=ctx+1, C]`), returns the initial state."""
    from .pad import pad1d
    effective_k = (kernel_size - 1) * dilation + 1
    ctx = effective_k - stride
    if ctx == 0:
        return x_head[:, :0]
    padded = pad1d(x_head, (ctx, 0), mode=pad_mode)
    return padded[:, :ctx]


def convtr_stream_init(batch: int, out_ch: int, kernel_size: int,
                       stride: int = 1, dtype=jnp.float32) -> Array:
    """Overlap-add carry for a causal transposed conv: `k - s` samples."""
    return jnp.zeros((batch, kernel_size - stride, out_ch), dtype)


def sconv_transpose1d_stream(params: Params, x: Array, carry: Array, *,
                             kernel_size: int, stride: int = 1,
                             norm: str = "none",
                             precision=None) -> tp.Tuple[Array, Array]:
    """One streaming step of a causal SConvTranspose1d with
    `trim_right_ratio == 1.0` (all trimming on the right, the streaming
    configuration — ref conv.py:252-257).

    x: `[B, L, Cin]`; carry: `[B, k - s, Cout]` overlap tail (bias-free).
    Returns `(y [B, L*s, Cout], new_carry)` where `y` matches the batch
    forward of the same chunk boundary exactly.
    """
    assert norm in ("none", "weight_norm"), \
        "streaming transposed conv supports parameter norms only"
    k, s = kernel_size, stride
    pt = k - s
    w = _effective_weight(params, transposed=True).astype(x.dtype)
    full = conv_transpose1d(x, w, None, stride=s, precision=precision)
    # overlap-add the previous tail into the head
    L_out = x.shape[1] * s
    full = full.at[:, :pt].add(carry) if pt > 0 else full
    y = full[:, :L_out]
    new_carry = full[:, L_out:L_out + pt]
    if params.get("b") is not None:
        y = y + params["b"].astype(y.dtype)
    return y, new_carry


def sconv1d_stream_finish(params: Params, x: Array, state: Array, *,
                          kernel_size: int, stride: int = 1,
                          dilation: int = 1, norm: str = "none",
                          pad_mode: str = "reflect",
                          precision=None, lowering: str = "mxu") -> Array:
    """Final (tail) step of a causal SConv1d stream: batch-equivalent
    end-of-signal semantics.

    The batch path right-pads each conv so its last window is full
    (`get_extra_padding_for_conv1d`, ref conv.py:55-62) using `pad_mode` —
    so a signal whose length is not a stride multiple still yields
    `ceil(L/s)` frames, the last one seeing reflect-padded samples. A plain
    `sconv1d_stream` can't consume such a tail (it requires `L % s == 0`);
    this finish step takes the remaining `0 < r` samples, applies the same
    `(-r) mod s` right padding the batch path would (identical because the
    stream has consumed a stride multiple so far), and returns the final
    `ceil(r/s)` output frames. The needed reflect material always fits in
    `[state | tail]`: `extra <= s-1` and the state holds `k_e - s`
    samples (`k_e = 2s` for every strided SEANet conv).
    """
    from .pad import pad1d
    if norm == "time_group_norm":
        raise ValueError("GroupNorm doesn't support causal evaluation.")
    effective_k = (kernel_size - 1) * dilation + 1
    extra = (-x.shape[1]) % stride
    full = jnp.concatenate([state, x], axis=1)
    if extra:
        full = pad1d(full, (0, extra), mode=pad_mode)
    w = _effective_weight(params).astype(x.dtype)
    b = params.get("b")
    y = conv1d(full, w, None if b is None else b.astype(x.dtype),
               stride=stride, dilation=dilation, precision=precision,
               lowering=lowering)
    return _apply_norm(y, params, norm)
