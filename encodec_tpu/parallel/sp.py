"""Sequence-parallel SEANet encoding: shard time over a `seq` mesh axis.

The fork feeds whole 4-hour, 144k-sample signals through the conv stack
(SURVEY §5); at those lengths the activation footprint and conv FLOPs
dominate. Causal convolutions admit exact time sharding: each conv layer
only needs `effective_kernel - stride` samples of left halo from the
neighboring shard, exchanged with one tiny `ppermute` per layer while every
device computes in parallel. Shard 0 primes its context with the same
reflect padding the batch forward applies at the signal start, so the result
is **bit-exact** with the unsharded forward.

The LSTM is inherently sequential over time, but it runs at the token rate
(`hop` = 320x fewer steps than input samples), so after the sharded conv
trunk the `[B, T/hop, C]` features are all-gathered (small) and the
LSTM + final conv run replicated. Compute split: conv trunk ~hop x more
samples than everything after it.

Composable with the `data` axis on a 2-D mesh (batch-sharded, time-sharded).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.seanet import (SEANetConfig, _act, _resblock_dims,
                             resolve_activation)
from ..ops.streaming import sconv1d_stream, prime_conv_stream
from .. import ops

Array = jnp.ndarray


def _halo_or_prime(y: Array, ctx: int, k: int, s: int, d: int,
                   axis_name: str, cfg: SEANetConfig) -> Array:
    """Left context for this shard: previous shard's tail, except shard 0
    which uses the batch-start reflect padding of its own head."""
    if ctx == 0:
        return y[:, :0]
    if y.shape[1] < ctx:
        raise ValueError(
            f"sequence-parallel shard too short: per-shard length "
            f"{y.shape[1]} < receptive context {ctx} of a conv layer "
            f"(kernel {k}, stride {s}, dilation {d}). Use fewer shards or "
            f"a longer signal (analogous to streaming.min_first_chunk).")
    n = jax.lax.axis_size(axis_name)
    tail = y[:, y.shape[1] - ctx:]
    halo = jax.lax.ppermute(tail, axis_name,
                            perm=[(i, i + 1) for i in range(n - 1)])
    start_ctx = prime_conv_stream(y, k, s, d, pad_mode=cfg.pad_mode)
    is_first = (jax.lax.axis_index(axis_name) == 0)
    return jnp.where(is_first, start_ctx, halo)


def _sp_conv(p, y, *, k, s=1, d=1, cfg: SEANetConfig, axis_name: str,
             norm=None, precision=None, lowering="mxu"):
    effective_k = (k - 1) * d + 1
    ctx = effective_k - s
    state = _halo_or_prime(y, ctx, k, s, d, axis_name, cfg)
    out, _ = sconv1d_stream(p, y, state, kernel_size=k, stride=s, dilation=d,
                            norm=cfg.norm if norm is None else norm,
                            precision=precision, lowering=lowering)
    return out


def _sp_resblock(p, x, cfg: SEANetConfig, dilations, axis_name,
                 precision=None, lowering="mxu"):
    ks, _ = _resblock_dims(cfg, x.shape[-1])
    y = x
    for conv_p, k, d in zip(p["convs"], ks, dilations):
        y = _act(y, cfg.activation_alpha)
        y = _sp_conv(conv_p, y, k=k, d=d, cfg=cfg, axis_name=axis_name,
                     precision=precision, lowering=lowering)
    if "shortcut" in p:
        sc = _sp_conv(p["shortcut"], x, k=1, cfg=cfg, axis_name=axis_name,
                      precision=precision, lowering=lowering)
    else:
        sc = x
    return sc + y


def _trunk(params, x_local: Array, cfg: SEANetConfig, axis_name: str,
           precision=None, lowering="mxu") -> Array:
    """Sharded conv trunk (everything before the LSTM)."""
    y = _sp_conv(params["init_conv"], x_local, k=cfg.kernel_size, cfg=cfg,
                 axis_name=axis_name, precision=precision, lowering=lowering)
    for stage, ratio in zip(params["stages"], cfg.encoder_ratios):
        for j, res_p in enumerate(stage["res"]):
            y = _sp_resblock(res_p, y, cfg, [cfg.dilation_base ** j, 1],
                             axis_name, precision=precision,
                             lowering=lowering)
        y = _act(y, cfg.activation_alpha)
        y = _sp_conv(stage["down"], y, k=ratio * 2, s=ratio, cfg=cfg,
                     axis_name=axis_name, precision=precision,
                     lowering=lowering)
    return y


def seanet_encode_sp(params, x: Array, cfg: SEANetConfig, mesh: Mesh, *,
                     axis_name: str = "seq",
                     batch_axis: tp.Optional[str] = None,
                     precision=None, lowering: str = "mxu") -> Array:
    """Sequence-parallel `seanet_encoder`. x: `[B, T, C]` with
    `T % (n_shards * hop) == 0`. Returns `[B, T/hop, dimension]`,
    bit-exact with the unsharded forward — pass the SAME `lowering` the
    unsharded encode uses (`EncodecModel._encode_lowering`; "auto" at
    set_precision('high'/'fast')) or near-tie codes can diverge.
    """
    assert cfg.causal, "sequence parallelism requires a causal model"
    n = mesh.shape[axis_name]
    assert x.shape[1] % (n * cfg.hop_length) == 0, \
        (x.shape, n, cfg.hop_length)

    def fn(x_local):
        y = _trunk(params, x_local, cfg, axis_name, precision,
                   lowering=lowering)
        # token-rate tail: gather across shards, run replicated
        y_full = jax.lax.all_gather(y, axis_name, axis=1, tiled=True)
        if cfg.lstm:
            y_full = ops.lstm(params["lstm"], y_full, skip=True,
                              precision=precision)
        y_full = _act(y_full, cfg.activation_alpha)
        from ..ops import sconv1d
        y_full = sconv1d(params["final_conv"], y_full,
                         kernel_size=cfg.last_kernel_size, causal=True,
                         norm=cfg.norm, pad_mode=cfg.pad_mode,
                         precision=precision, lowering=lowering)
        return y_full

    in_spec = P(batch_axis, axis_name) if batch_axis else P(None, axis_name)
    out_spec = P(batch_axis) if batch_axis else P()
    return shard_map(fn, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec,
                     check_vma=False)(x)


def encode_sp(params, qstate, x: Array, cfg, mesh: Mesh, *,
              n_q: tp.Optional[int] = None, axis_name: str = "seq",
              precision=jax.lax.Precision.HIGHEST, lowering: str = "mxu"):
    """Sequence-parallel encode: audio `[B, T, C]` → codes `[B, K, T/hop]`."""
    from ..quant import rvq_encode
    emb = seanet_encode_sp(params["encoder"], x, cfg.seanet, mesh,
                           axis_name=axis_name, precision=precision,
                           lowering=lowering)
    codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q, precision=precision)
    return jnp.transpose(codes, (1, 0, 2))


# ---------------------------------------------------------------------------
# Decoder: token-rate head replicated, upsampling trunk time-sharded
# ---------------------------------------------------------------------------

def _sp_convtr(p, y, *, k, s, cfg: SEANetConfig, axis_name,
               precision=None):
    """Causal transposed conv with the overlap tail ppermuted rightward.

    Each shard computes its full (untrimmed, bias-free) output; the
    `k - s` tail belongs to the next shard's head and is exchanged like
    the streaming carry (shard 0 receives zeros — exactly the
    stream-start state)."""
    from ..ops.conv import _effective_weight, conv_transpose1d
    pt = k - s
    w = _effective_weight(p, transposed=True)
    full = conv_transpose1d(y, w, None, stride=s, precision=precision)
    L_out = y.shape[1] * s
    n = jax.lax.axis_size(axis_name)
    tail = full[:, L_out:L_out + pt] if pt > 0 else full[:, :0]
    if pt > 0:
        halo = jax.lax.ppermute(tail, axis_name,
                                perm=[(i, i + 1) for i in range(n - 1)])
        out = full[:, :L_out].at[:, :pt].add(halo)
    else:
        out = full[:, :L_out]
    if p.get("b") is not None:
        out = out + p["b"]
    if cfg.norm == "layer_norm":
        from .. import ops
        out = ops.layer_norm(out, p["norm"]["scale"], p["norm"]["bias"])
    return out


def seanet_decode_sp(params, z: Array, cfg: SEANetConfig, mesh: Mesh, *,
                     axis_name: str = "seq",
                     precision=None, lowering: str = "auto") -> Array:
    """Sequence-parallel `seanet_decoder` for causal models with
    `trim_right_ratio == 1.0`. z: `[B, Tz, D]` with `Tz % n_shards == 0`.
    Returns `[B, Tz*hop, C]`, matching the unsharded forward to float
    epsilon (the transposed-conv accumulation is split at shard
    boundaries and re-added, like the streaming decoder).

    The token-rate head (init conv + LSTM) runs replicated — the LSTM is
    sequential and cheap at token rate — then the upsampling trunk (the
    `hop`× more expensive half) is time-sharded with per-layer halos.
    """
    assert cfg.causal and cfg.trim_right_ratio == 1.0
    n = mesh.shape[axis_name]
    assert z.shape[1] % n == 0, (z.shape, n)

    def fn(z_full):
        from .. import ops
        y = ops.sconv1d(params["init_conv"], z_full,
                        kernel_size=cfg.kernel_size, causal=True,
                        norm=cfg.norm, pad_mode=cfg.pad_mode,
                        precision=precision, lowering=lowering)
        if cfg.lstm:
            y = ops.lstm(params["lstm"], y, skip=True, precision=precision)
        # shard the token axis: this shard's slice
        Tz = y.shape[1]
        per = Tz // n
        idx = jax.lax.axis_index(axis_name)
        y = jax.lax.dynamic_slice_in_dim(y, idx * per, per, axis=1)
        for stage, ratio in zip(params["stages"], cfg.ratios):
            y = _act(y, cfg.activation_alpha)
            y = _sp_convtr(stage["up"], y, k=ratio * 2, s=ratio,
                           cfg=cfg, axis_name=axis_name, precision=precision)
            for j, res_p in enumerate(stage["res"]):
                y = _sp_resblock(res_p, y, cfg, [cfg.dilation_base ** j, 1],
                                 axis_name, precision=precision,
                                 lowering=lowering)
        y = _act(y, cfg.activation_alpha)
        y = _sp_conv(params["final_conv"], y, k=cfg.last_kernel_size,
                     cfg=cfg, axis_name=axis_name,
                     norm=cfg.resolved_decoder_final_norm(),
                     precision=precision, lowering=lowering)
        if cfg.final_activation is not None:
            y = resolve_activation(cfg.final_activation)(y)
        return y

    return shard_map(fn, mesh=mesh,
                     in_specs=(P(),),
                     out_specs=P(None, axis_name),
                     check_vma=False)(z)


def decode_sp(params, qstate, codes: Array, cfg, mesh: Mesh, *,
              axis_name: str = "seq",
              precision=jax.lax.Precision.HIGHEST,
              lowering: str = "auto") -> Array:
    """Sequence-parallel decode: codes `[B, K, Tz]` → audio `[B, Tz*hop, C]`.
    `lowering` defaults to "auto" to match the unsharded `seanet_decoder`."""
    from ..quant import rvq_decode
    emb = rvq_decode(qstate, jnp.transpose(codes, (1, 0, 2)), cfg.rvq)
    return seanet_decode_sp(params["decoder"], emb, cfg.seanet, mesh,
                            axis_name=axis_name, precision=precision,
                            lowering=lowering)
