"""1-D padding math for streamable convolutions.

Mirrors the observable padding contract of the reference
(`encodec/modules/conv.py:55-106`): convolutions see enough right padding
that the *last* window is always full, causal convs pad entirely on the
left, and reflect padding works even when the signal is shorter than the
pad amount.

All functions take channels-last `[B, T, C]` arrays and *static* python int
pad amounts, so everything stays shape-static under `jit`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """Extra right-padding so the final conv window is full.

    `length` is the (static) time length. With this extra padding, the conv
    output has ``ceil((length - k + padding_total) / stride) + 1`` frames and
    a matching transposed conv can rebuild the original length.
    Ref parity: encodec/modules/conv.py:55-62.
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad1d(x: jnp.ndarray, paddings: tuple[int, int], mode: str = "zero",
          value: float = 0.0) -> jnp.ndarray:
    """Pad the time axis (axis 1 of `[B, T, C]`).

    For reflect mode with inputs shorter than the pad, zero-extend first so
    the reflection is well defined, then trim the extension — the same
    observable behavior as the reference's small-input workaround
    (encodec/modules/conv.py:80-97).
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    widths = ((0, 0), (padding_left, padding_right), (0, 0))
    if mode == "reflect":
        length = x.shape[1]
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra_pad), (0, 0)))
        padded = jnp.pad(x, widths, mode="reflect")
        end = padded.shape[1] - extra_pad
        return padded[:, :end]
    elif mode in ("zero", "constant"):
        return jnp.pad(x, widths, constant_values=value)
    elif mode == "replicate":
        return jnp.pad(x, widths, mode="edge")
    else:
        raise ValueError(f"Unsupported pad mode {mode!r}")


def unpad1d(x: jnp.ndarray, paddings: tuple[int, int]) -> jnp.ndarray:
    """Remove left/right padding from the time axis of `[B, T, C]`."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end]
