"""Segment recombination: linear-fade overlap-add (ref encodec/utils.py:17-56)."""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

Array = jnp.ndarray


def linear_overlap_add(frames: tp.Sequence[Array], stride: int) -> Array:
    """Overlap-add `[B, T, C]` frames with triangular weights.

    Frames are placed `stride` apart; each is weighted by a triangle peaking
    at its middle and the result is renormalized by the summed weights, so a
    position covered by one frame is untouched and two overlapping frames
    cross-fade linearly.
    """
    assert len(frames)
    dtype = frames[0].dtype
    B, _, C = frames[0].shape
    total_size = stride * (len(frames) - 1) + frames[-1].shape[1]

    frame_length = frames[0].shape[1]
    t = jnp.linspace(0, 1, frame_length + 2, dtype=dtype)[1:-1]
    weight = 0.5 - jnp.abs(t - 0.5)

    sum_weight = jnp.zeros((total_size,), dtype)
    out = jnp.zeros((B, total_size, C), dtype)
    offset = 0
    for frame in frames:
        fl = frame.shape[1]
        out = out.at[:, offset:offset + fl].add(weight[:fl, None] * frame)
        sum_weight = sum_weight.at[offset:offset + fl].add(weight[:fl])
        offset += stride
    return out / sum_weight[None, :, None]
