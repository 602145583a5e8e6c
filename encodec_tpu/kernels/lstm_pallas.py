"""Fused LSTM sequence scan (Pallas TPU kernel).

The LSTM is the codec's only long sequential chain (SURVEY §3.3 calls it
the dominant latency term). The XLA path (`ops/lstm.py`) already hoists the
input projection into one big MXU matmul; this kernel fuses the remaining
scan: recurrent weights stay resident in VMEM, the hidden/cell state lives
in scratch that persists across grid steps, and the pre-projected gate
inputs / outputs are pipelined chunk-by-chunk by Pallas' automatic block
DMA. One kernel launch replaces T tiny while-loop iterations.

Gate order (i, f, g, o) matches torch/ops.lstm so parameters interchange.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _scan_kernel(xp_ref, whh_ref, out_ref, h_scr, c_scr, *, chunk: int,
                 hidden: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def step(t, _):
        gates = xp_ref[:, t, :] + jax.lax.dot_general(
            h_scr[:], whh_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        i = jax.nn.sigmoid(gates[:, 0:hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        out_ref[:, t, :] = h
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def lstm_scan_pallas(x_proj: Array, w_hh_t: Array, *,
                     chunk: tp.Optional[int] = None,
                     interpret: bool = False) -> Array:
    """Run one LSTM layer's recurrence over a whole sequence.

    x_proj: `[B, T, 4H]` pre-projected gate inputs (x @ W_ihᵀ + b_ih + b_hh);
    w_hh_t: `[H, 4H]` transposed recurrent weights. Returns hidden states
    `[B, T, H]` from zero initial state (SLSTM semantics, ref lstm.py:24).
    `T` is padded to a multiple of `chunk` internally; when `chunk` is None
    it is sized so the double-buffered input block stays within ~2 MB of
    VMEM (large batches at chunk=32 exceeded the VMEM budget and failed to
    compile).
    """
    B, T, H4 = x_proj.shape
    H = H4 // 4
    if chunk is None:
        chunk = max(8, min(32, (2 * 1024 * 1024) // (B * H4 * 4)))
    n_chunks = pl.cdiv(T, chunk)
    padded = n_chunks * chunk
    if padded != T:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, padded - T), (0, 0)))
    kernel = functools.partial(_scan_kernel, chunk=chunk, hidden=H)
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, chunk, H4), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, chunk, H), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, padded, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * padded * H * H4,
            bytes_accessed=(B * padded * H4 + H * H4 + B * padded * H) * 4,
            transcendentals=B * padded * H * 4),
        interpret=interpret,
    )(x_proj, w_hh_t)
    return out[:, :T]


def lstm_pallas(params: dict, x: Array, *, skip: bool = True,
                chunk: tp.Optional[int] = None, interpret: bool = False,
                precision=None) -> Array:
    """Stacked-LSTM forward using the fused scan kernel per layer.

    Drop-in for `ops.lstm(params, x, skip=...)` on the full-sequence
    (zero-initial-state) path.
    """
    y = x
    for layer in params["layers"]:
        x_proj = jnp.einsum("btc,hc->bth", y, layer["w_ih"],
                            precision=precision) \
            + layer["b_ih"] + layer["b_hh"]
        y = lstm_scan_pallas(x_proj, layer["w_hh"].T, chunk=chunk,
                             interpret=interpret)
    if skip:
        y = y + x
    return y
