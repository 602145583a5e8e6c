"""Tensor-parallel RVQ codebook search over a `model` mesh axis.

The nearest-neighbor search is a `[N, D] x [D, bins]` matmul + argmin. For
large codebooks / many stages, the codebook axis shards cleanly: each device
scores its `bins/n` shard, then a tiny `(value, index)` all-gather over ICI
combines the per-shard winners. Tie-breaking matches the single-device path
(lowest global index wins): each shard's argmax already picks its lowest
local index, and the cross-shard argmax picks the first (lowest-offset)
shard among equal scores.

Built with `shard_map` so it composes with the data-parallel batch axis —
a `Mesh(('data', 'model'))` runs batch-sharded RVQ with codebook-sharded
search, XLA routing both collectives over ICI.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

Array = jnp.ndarray


def _local_scores(x: Array, embed_local: Array,
                  precision=jax.lax.Precision.HIGHEST):
    """Per-shard best (negated distance, local index). x: [N, D],
    embed_local: [bins_local, D] → ([N], [N])."""
    et = embed_local.T
    dist = -(jnp.sum(jnp.square(x), axis=1, keepdims=True)
             - 2.0 * jnp.dot(x, et, precision=precision)
             + jnp.sum(jnp.square(et), axis=0, keepdims=True))
    idx = jnp.argmax(dist, axis=-1)
    val = jnp.take_along_axis(dist, idx[:, None], axis=-1)[:, 0]
    return val, idx


def _search_shard_map(mesh: Mesh, bins: int, axis_name: str,
                      batch_axis: tp.Optional[str], precision,
                      with_lookup: bool):
    """shard_map'd `(x [N, D], embed [bins, D]) -> idx [N] (, q [N, D])`.

    The winning shard's embedding row is recovered with a masked `psum`
    over the model axis (exactly one shard owns each winning index), so
    the residual update never leaves the mesh — no cross-shard gather on
    a sharded table."""
    n_shards = mesh.shape[axis_name]
    assert bins % n_shards == 0, (bins, n_shards)
    bins_local = bins // n_shards

    def kernel(x_local, embed_local):
        val, idx = _local_scores(x_local, embed_local, precision)
        offset = jax.lax.axis_index(axis_name) * bins_local
        vals = jax.lax.all_gather(val, axis_name)          # [S, n]
        idxs = jax.lax.all_gather(idx + offset, axis_name)  # [S, n]
        best_shard = jnp.argmax(vals, axis=0)               # first max wins
        gidx = jnp.take_along_axis(idxs, best_shard[None], axis=0)[0]
        if not with_lookup:
            return gidx
        mine = (gidx >= offset) & (gidx < offset + bins_local)
        rel = jnp.clip(gidx - offset, 0, bins_local - 1)
        row = embed_local[rel] * mine[:, None].astype(embed_local.dtype)
        q = jax.lax.psum(row, axis_name)
        return gidx, q

    x_spec = P(batch_axis) if batch_axis else P()
    out_specs = (x_spec, x_spec) if with_lookup else x_spec
    return shard_map(
        kernel, mesh=mesh,
        in_specs=(x_spec, P(axis_name)),
        out_specs=out_specs,
        # the all_gather/psum make every shard's result identical, but
        # that replication isn't statically inferable
        check_vma=False,
    )


def nearest_codebook_tp(x: Array, embed: Array, mesh: Mesh,
                        axis_name: str = "model",
                        batch_axis: tp.Optional[str] = None,
                        precision=jax.lax.Precision.HIGHEST) -> Array:
    """Sharded nearest-codebook search. x: [N, D] (optionally sharded on
    `batch_axis`), embed: [bins, D] sharded on `axis_name`. Returns [N]
    global indices, identical to the single-device search."""
    return _search_shard_map(mesh, embed.shape[0], axis_name, batch_axis,
                             precision, with_lookup=False)(x, embed)


def rvq_encode_tp(state, x: Array, cfg, mesh: Mesh, *,
                  n_q: tp.Optional[int] = None, axis_name: str = "model",
                  batch_axis: tp.Optional[str] = None,
                  precision=jax.lax.Precision.HIGHEST) -> Array:
    """Tensor-parallel `rvq_encode`: x `[B, T, D]` → codes `[K, B, T]`.

    The stage loop stays on the host side of shard_map (few stages); each
    stage's search AND its residual embedding lookup run sharded (one
    fused shard_map per stage). The codebook stack is placed on the mesh
    ONCE — not per stage — with the bins axis sharded.
    """
    n_q = min(n_q or cfg.n_q, cfg.n_q)
    B, T, D = x.shape
    flat = x.reshape(B * T, D)
    books = jax.device_put(
        state.embed, NamedSharding(mesh, P(None, axis_name)))
    fused = _search_shard_map(mesh, books.shape[1], axis_name, batch_axis,
                              precision, with_lookup=True)
    codes = []
    residual = flat
    for k in range(n_q):
        book = books[0] if cfg.shared_codebook else books[k]
        idx, q = fused(residual, book)
        residual = residual - q
        codes.append(idx)
    return jnp.stack(codes).reshape(n_q, B, T)
