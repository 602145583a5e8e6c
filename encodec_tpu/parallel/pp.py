"""Pipeline parallelism for the entropy-model transformer (GPipe on TPU).

The reference has no pipeline parallelism anywhere (SURVEY §2.7 — its only
axis is single-process DataParallel); this module is a beyond-reference
scaling axis for the one component deep enough to pipeline: the
multi-codebook LM transformer (`models/lm.py`, ref encodec/model.py:45-83 /
modules/transformer.py). The SEANet codec trunks are deliberately NOT
pipelined — their stages are heterogeneous (channels double while time
shrinks 8-5-4-2x per stage), so a layer-split would be hopelessly
load-imbalanced; the codec scales over `data`/`seq`/`model` instead
(parallel/{mesh,sp,tp}.py). Expert parallelism likewise has no target in
this model family (no MoE layers), which is why the parallel package stops
at dp/tp/sp/pp.

Design — the standard TPU pipeline schedule (scaling-book recipe):

* the transformer's L layers are split into S = mesh.shape['pipe'] stages
  of L/S layers; the stacked per-stage parameters are sharded over the
  `pipe` mesh axis (leading axis S), so each device holds only its own
  stage's weights;
* the batch is split into M microbatches; inside one `shard_map`, a
  `lax.scan` over S+M-1 ticks runs each stage on its current microbatch
  and hands activations to the next stage with a single-hop
  `lax.ppermute` (a nearest-neighbor ICI transfer — the bubble is the
  usual (S-1)/(S-1+M) GPipe fraction);
* the tiny replicated pieces (embedding sum, input norm, sinusoid
  positions, per-codebook heads) run outside the pipelined trunk.

Everything is one jitted program: autodiff through `scan` + `ppermute`
yields the reverse pipeline schedule automatically, so the same module
serves training (`make_lm_pp_train_step`) and inference
(`lm_forward_batch_pp`). Composes with a `data` axis on a 2-D
`data x pipe` mesh: microbatches are additionally sharded over `data` and
XLA inserts the gradient all-reduce across the data axis.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lm import (LMConfig, _transformer_layer, lm_head, lm_prologue)

Array = jnp.ndarray


def stack_lm_layers(params: dict, n_stages: int) -> tp.Tuple[dict, dict]:
    """Split LM params into (stacked trunk, replicated rest).

    The per-layer dicts (`params['layers']`, a length-L list) are stacked
    leaf-wise into `[S, L//S, ...]` arrays — leading axis = pipeline stage,
    second = layer-within-stage. Returns `(stacked_layers, other)` where
    `other` carries emb/norm_in/linears unchanged.
    """
    layers = params["layers"]
    L = len(layers)
    if L % n_stages != 0:
        raise ValueError(
            f"num_layers={L} not divisible by n_stages={n_stages}")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    stacked = jax.tree.map(
        lambda x: x.reshape((n_stages, L // n_stages) + x.shape[1:]), stacked)
    other = {k: v for k, v in params.items() if k != "layers"}
    return stacked, other


def shard_stacked_layers(stacked: dict, mesh: Mesh,
                         axis_name: str = "pipe") -> dict:
    """Place stacked trunk params on the mesh, stage axis sharded."""
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def _stage_apply(stage_layers: dict, x: Array, mask: Array, num_heads: int,
                 precision) -> Array:
    """Apply this stage's L//S transformer layers (scan over the stacked
    leading axis). Each layer sees the same initial-zero-entry past as the
    offline path (ref transformer.py:106)."""
    zero = jnp.zeros((x.shape[0], 1, x.shape[-1]), x.dtype)

    def body(h, layer):
        h, _ = _transformer_layer(layer, h, zero, mask, num_heads, precision)
        return h, None

    x, _ = jax.lax.scan(body, x, stage_layers)
    return x


def _pp_trunk(stacked: dict, x_mb: Array, mask: Array, cfg: LMConfig,
              n_stages: int, axis_name: str, precision) -> Array:
    """shard_map body: GPipe schedule over `[M, Bm, T, C]` microbatches.

    Runs on every device; `stacked` leaves arrive as `[1, L//S, ...]` (this
    device's stage). Returns the replicated `[M, Bm, T, C]` trunk output.
    """
    my_layers = jax.tree.map(lambda v: v[0], stacked)
    stage = jax.lax.axis_index(axis_name)
    S = n_stages
    M = x_mb.shape[0]
    # initial carries are device-varying (each stage's buffer diverges)
    def _varying(v):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(v, (axis_name,), to="varying")
        return jax.lax.pvary(v, (axis_name,))

    buf = _varying(jnp.zeros_like(x_mb[0]))
    outputs = _varying(jnp.zeros_like(x_mb))

    def tick(carry, t):
        buf, outputs = carry
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
        inp = jnp.where(stage == 0, feed, buf)
        out = _stage_apply(my_layers, inp, mask, cfg.num_heads, precision)
        out_idx = jnp.clip(t - (S - 1), 0, M - 1)
        write = (stage == S - 1) & (t >= S - 1)
        prev = jax.lax.dynamic_index_in_dim(outputs, out_idx, axis=0,
                                            keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(write, out, prev), out_idx, axis=0)
        buf = jax.lax.ppermute(out, axis_name,
                               [(i, i + 1) for i in range(S - 1)])
        return (buf, outputs), None

    (buf, outputs), _ = jax.lax.scan(tick, (buf, outputs),
                                     jnp.arange(S + M - 1))
    # only the last stage ever wrote non-zeros → psum replicates its result
    return jax.lax.psum(outputs, axis_name)


def lm_forward_batch_pp(stacked: dict, other: dict, indices: Array,
                        cfg: LMConfig, mesh: Mesh,
                        n_microbatches: tp.Optional[int] = None,
                        axis_name: str = "pipe", offset: int = 0,
                        precision=None, return_logits: bool = False) -> Array:
    """Pipelined equivalent of `lm_forward_batch` (same `[B, card, K, T]`
    output, float-epsilon — a different XLA executable, so not bit-pinned
    to the entropy-codec path; see models/lm.py::lm_scan_chunk for why the
    codec pins one executable).

    `indices`: `[B, K, T]` shifted codes. The batch is split into
    `n_microbatches` (default: pipeline depth) equal microbatches.
    """
    S = mesh.shape[axis_name]
    B, K, T = indices.shape
    M = n_microbatches if n_microbatches is not None else S
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by n_microbatches {M}")

    # prologue/head shared with the offline path (bit-sensitive codec —
    # one definition, see lm_prologue/lm_head)
    x, mask = lm_prologue(other, indices, cfg, offset)

    # data-axis composition: any other mesh axes shard the microbatch ROW
    # dimension — each data row pipelines its own batch slice and XLA
    # inserts the data-axis gradient all-reduce at the (replicated) params.
    data_axes = tuple(a for a in mesh.axis_names if a != axis_name)
    row_spec = data_axes if data_axes else None
    x_spec = P(None, row_spec)                          # [M, Bm, T, C]
    x_mb = x.reshape(M, B // M, T, cfg.dim)
    trunk = shard_map(
        functools.partial(_pp_trunk, mask=mask, cfg=cfg, n_stages=S,
                          axis_name=axis_name, precision=precision),
        mesh=mesh,
        in_specs=(P(axis_name), x_spec),
        out_specs=x_spec,
    )
    x = trunk(stacked, x_mb).reshape(B, T, cfg.dim)
    return lm_head(other, x, K, precision, return_logits)


def make_lm_pp_train_step(cfg: LMConfig, opt, mesh: Mesh,
                          n_microbatches: tp.Optional[int] = None,
                          axis_name: str = "pipe", precision=None):
    """Jitted pipelined LM training step.

    `params` are `(stacked, other)` as returned by `stack_lm_layers` (place
    `stacked` with `shard_stacked_layers` so each device holds one stage);
    autodiff through the pipeline's scan + ppermute produces the reverse
    schedule, and the stage-sharded gradients land on the stage's device —
    optimizer state follows the parameter sharding under jit.
    """
    from ..train.lm_train import shift_codes

    def loss_fn(params, codes):
        stacked, other = params
        inputs = shift_codes(codes)
        logits = lm_forward_batch_pp(
            stacked, other, inputs, cfg, mesh, n_microbatches,
            axis_name=axis_name, precision=precision, return_logits=True)
        logp = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.take_along_axis(logp, codes[:, None], axis=1)[:, 0]
        loss = jnp.mean(nll)
        return loss, {"nll": loss, "bits_per_code": loss / jnp.log(2.0)}

    @jax.jit
    def step(params, opt_state, codes):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, codes)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    return step
