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


# ---------------------------------------------------------------------------
# Fused full-RVQ encode: every stage's search + residual update in one
# kernel, the residual VMEM-resident across stages.
# ---------------------------------------------------------------------------

def _rvq_kernel(x_ref, e_ref, out_ref, res_scr, *, bins: int, n_q: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        res_scr[:] = x_ref[:]
        out_ref[:] = jnp.zeros_like(out_ref)

    res = res_scr[:]                              # [TILE_N, D]
    e = e_ref[0]                                  # [bins, D] (stage k)
    xe = jax.lax.dot_general(
        res, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # [TILE_N, bins]
    x_sq = jnp.sum(jnp.square(res), axis=1, keepdims=True)
    e_sq = jnp.sum(jnp.square(e), axis=1)[None, :]
    dist = -(x_sq - 2.0 * xe + e_sq)
    idx = jnp.argmax(dist, axis=1).astype(jnp.int32)
    # deposit stage k's indices into row k of the [n_q, TILE_N] output block
    # (revisited across stages) with an iota mask — no dynamic indexing
    row = jax.lax.broadcasted_iota(jnp.int32, (n_q, idx.shape[0]), 0)
    out_ref[:] = out_ref[:] + jnp.where(row == k, idx[None, :], 0)
    # residual update via one-hot MXU matmuls (VMEM gather). Row selection
    # must be EXACT; a full HIGHEST (6-pass) matmul is wasteful because the
    # 0/1 one-hot operand is already exactly bf16 — only `e` needs the
    # 3-way bf16 split (e == hi+mid+lo exactly for f32 inputs), so three
    # default-precision bf16 passes reproduce e's rows bit-exactly.
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], bins), 1)
              == idx[:, None]).astype(jnp.bfloat16)
    e_hi = e.astype(jnp.bfloat16)
    r1 = e - e_hi.astype(jnp.float32)
    e_mid = r1.astype(jnp.bfloat16)
    e_lo = (r1 - e_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    quantized = (
        jax.lax.dot_general(onehot, e_hi, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(onehot, e_mid, dn,
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(onehot, e_lo, dn,
                              preferred_element_type=jnp.float32))
    res_scr[:] = res - quantized


@functools.partial(jax.jit,
                   static_argnames=("n_q", "shared", "tile_n", "interpret"))
def rvq_encode_pallas(x: Array, embed: Array, *, n_q: int,
                      shared: bool = False, tile_n: int = 512,
                      interpret: bool = False) -> Array:
    """Full residual-VQ encode in one fused kernel.

    x: `[N, D]` flattened latents; embed: `[n_q_total, bins, D]` per-stage
    codebooks (row 0 reused for every stage when `shared`). Returns codes
    `[n_q, N]` int32.

    Fusion structure: grid `(tiles, stages)` with the stage dimension
    innermost — the residual lives in a VMEM scratch across all `n_q`
    stages, so unlike the XLA `lax.scan` path the `[N, D]` residual never
    round-trips HBM between stages; the only HBM traffic is `x` in (once
    per tile), one `[bins, D]` codebook block per stage (elided by Mosaic's
    unchanged-block-index reuse when `shared`), and the `[N]` indices out.
    The distance math (association order, HIGHEST precision, first-max
    tie-break) matches the XLA parity path exactly, and the residual
    subtraction uses an exact one-hot MXU gather.

    Parity caveat: codes equal the XLA path except on EXACT distance ties
    (two codebook rows equidistant from the residual), where last-ulp
    float differences between separately compiled executables can flip the
    winner — measured 48/768k flips at n_q=32 on random-init codebooks
    (late stages quantize noise), 0 flips at n_q<=8 or trained-codebook
    margins. The XLA path remains the bit-parity default; this kernel is
    the opt-in serving path (`set_nearest_impl("pallas_fused")`).
    """
    N, D = x.shape
    bins = embed.shape[1]
    n_tiles = pl.cdiv(N, tile_n)
    padded = n_tiles * tile_n
    if padded != N:
        x = jnp.pad(x, ((0, padded - N), (0, 0)))
    e_index = (lambda i, k: (0, 0, 0)) if shared else (lambda i, k: (k, 0, 0))
    out = pl.pallas_call(
        functools.partial(_rvq_kernel, bins=bins, n_q=n_q),
        grid=(n_tiles, n_q),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bins, D), e_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_q, tile_n), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, padded), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_n, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * padded * n_q * bins * D,
            bytes_accessed=(padded * D * 4 + n_q * bins * D * 4
                            + padded * n_q * 4),
            transcendentals=0),
        interpret=interpret,
    )(x, embed)
    return out[:, :N]
