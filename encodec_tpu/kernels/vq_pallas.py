"""Fused codebook nearest-neighbor search (Pallas TPU kernel).

The RVQ hot op is `argmin_j ||x_i - e_j||²` over a `[N, D]` batch of
residuals and a `[bins, D]` codebook. The XLA path materializes the
`[N, bins]` distance matrix in HBM before the argmax; this kernel keeps the
whole tile pipeline in VMEM — one MXU matmul per `[TILE_N, D]` tile against
the resident codebook, fused with the norm terms and the row argmax — so the
only HBM traffic is `x` in and `[N]` indices out.

Distance association order matches the reference (`‖x‖² - 2xEᵀ + ‖E‖²`,
argmax of the negation, first-max tie-break) like the XLA path in
quant/rvq.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _nearest_kernel(x_ref, e_ref, out_ref):
    x = x_ref[:]                                  # [TILE_N, D]
    e = e_ref[:]                                  # [bins, D]
    # full f32 precision so indices match the XLA HIGHEST parity path
    # (default MXU precision is bf16-ish and flips near-tie argmaxes)
    xe = jax.lax.dot_general(
        x, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # [TILE_N, bins]
    x_sq = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    e_sq = jnp.sum(jnp.square(e), axis=1)[None, :]
    dist = -(x_sq - 2.0 * xe + e_sq)
    out_ref[:] = jnp.argmax(dist, axis=1).astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def nearest_codebook_pallas(x: Array, embed: Array, *, tile_n: int = 512,
                            interpret: bool = False) -> Array:
    """Indices of the nearest codebook rows. x: [N, D], embed: [bins, D]."""
    N, D = x.shape
    bins = embed.shape[0]
    n_tiles = pl.cdiv(N, tile_n)
    padded = n_tiles * tile_n
    if padded != N:
        x = jnp.pad(x, ((0, padded - N), (0, 0)))
    out = pl.pallas_call(
        _nearest_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * bins * D,
            bytes_accessed=padded * D * 4 + bins * D * 4 + padded * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, embed)
    return out[:N, 0]
