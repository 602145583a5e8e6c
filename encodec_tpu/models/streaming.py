"""Streaming SEANet codec: chunked causal encode/decode with carry state.

Exactness contract: feeding chunks whose lengths are multiples of the hop
(`prod(ratios)`) reproduces the batch ENCODER bit-for-bit (hence identical
codes), including the reflect padding the batch path applies at the signal
start — each conv's initial context is primed from the head of its own
first-chunk input, which equals the batch padding by induction. The first
chunk must therefore be at least `receptive_context + 1` samples at every
layer; in practice a handful of hops (`min_first_chunk` reports the bound).
Chunked DECODE matches the batch decoder to float tolerance (~1 ulp): the
transposed convs sum their overlap-add contributions in a different order
at chunk boundaries (the carry is added after the chunk's conv instead of
inside one whole-sequence reduction) — decode's parity contract is float
tolerance anyway (BASELINE.md). Both paths must use the same conv
`lowering` as their batch counterparts; the streaming steps take it as a
parameter and `StreamingCodec` mirrors the model's.

State is a fixed-shape pytree (per-conv left contexts, LSTM (h, c),
per-transposed-conv overlap tails), so the chunk step is jit-stable.
Causal models only (the 48 kHz non-causal model streams via segments +
overlap-add instead, as upstream does).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from .. import ops
from ..ops.streaming import (sconv1d_stream, prime_conv_stream,
                             sconv_transpose1d_stream, convtr_stream_init)
from .seanet import SEANetConfig, _act, _resblock_dims


def min_first_chunk(cfg: SEANetConfig) -> int:
    """Smallest valid FIRST chunk length in samples (a hop multiple).

    Priming a conv layer's reflect left-context from the first chunk
    (`prime_conv_stream`) needs at least `ctx + 1` samples AT THAT LAYER'S
    rate; shorter first chunks silently prime with the short-input reflect
    fallback and diverge from the batch path. This walks the encoder's
    layer plan (init conv → per-stage resblocks + downsample → final conv)
    and returns the smallest hop multiple that satisfies every layer.
    """
    reqs: tp.List[tp.Tuple[int, int]] = []  # (ctx, downsample factor here)
    factor = 1

    def add(k: int, s: int = 1, d: int = 1) -> None:
        ctx = (k - 1) * d + 1 - s
        if ctx > 0:
            reqs.append((ctx, factor))

    add(cfg.kernel_size)
    for ratio in cfg.encoder_ratios:
        for j in range(cfg.n_residual_layers):
            add(cfg.residual_kernel_size, d=cfg.dilation_base ** j)
            add(1)
        add(2 * ratio, s=ratio)
        factor *= ratio
    add(cfg.last_kernel_size)  # token rate
    hop = factor
    L = hop
    while any(L // f < ctx + 1 for ctx, f in reqs):
        L += hop
    return L

def min_first_latent_chunk(cfg: SEANetConfig) -> int:
    """Smallest valid FIRST chunk length in LATENTS for the streaming
    decoder (`decoder_stream_step`).

    Like `min_first_chunk` but walking the decoder's plan: the init conv
    and each post-upsample resblock/final conv prime their reflect
    left-context from their own first-chunk input, which needs `ctx + 1`
    samples AT THAT LAYER'S rate; a shorter first chunk silently takes the
    short-input reflect fallback and diverges from the batch decoder
    (observed: 1.5e-2 max abs vs the documented ~1 ulp)."""
    need = 1
    factor = 1  # samples per latent at the current depth

    def req(k: int, d: int = 1) -> int:
        ctx = (k - 1) * d
        return -(-(ctx + 1) // factor)

    need = max(need, req(cfg.kernel_size))
    for ratio in cfg.ratios:
        factor *= ratio
        for j in range(cfg.n_residual_layers):
            need = max(need, req(cfg.residual_kernel_size,
                                 cfg.dilation_base ** j))
    need = max(need, req(cfg.last_kernel_size))
    return need


Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]


def _stream_conv(p, x, st, *, k, s=1, d=1, cfg: SEANetConfig, norm=None,
                 precision=None, lowering="mxu"):
    """Streaming conv; primes the state from this first chunk when None."""
    if st is None:
        st = prime_conv_stream(x, k, s, d, pad_mode=cfg.pad_mode)
    return sconv1d_stream(p, x, st, kernel_size=k, stride=s, dilation=d,
                          norm=cfg.norm if norm is None else norm,
                          precision=precision, lowering=lowering)


def _stream_resblock(p, x, st, cfg: SEANetConfig, dilations, precision=None,
                     lowering="mxu"):
    ks, _ = _resblock_dims(cfg, x.shape[-1])
    sts = st if st is not None else [None] * (len(ks) + 1)
    new_sts = []
    y = x
    for i, (conv_p, k, d) in enumerate(zip(p["convs"], ks, dilations)):
        y = _act(y, cfg.activation_alpha)
        y, s_new = _stream_conv(conv_p, y, sts[i], k=k, d=d, cfg=cfg,
                                precision=precision, lowering=lowering)
        new_sts.append(s_new)
    if "shortcut" in p:
        sc, s_new = _stream_conv(p["shortcut"], x, sts[len(ks)], k=1, cfg=cfg,
                                 precision=precision, lowering=lowering)
        new_sts.append(s_new)
    else:
        sc = x
        new_sts.append(jnp.zeros((x.shape[0], 0, x.shape[-1]), x.dtype))
    return sc + y, new_sts


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encoder_stream_step(params: Params, chunk: Array,
                        state: tp.Optional[dict], cfg: SEANetConfig,
                        precision=None,
                        lowering: str = "mxu") -> tp.Tuple[Array, dict]:
    """Process one `[B, L, C]` chunk (`L % hop == 0`) → `[B, L/hop, D]`.

    Pass `state=None` for the first chunk (priming); thread the returned
    state afterwards. `lowering` must match the batch encoder's
    (`EncodecModel._encode_lowering`: "mxu" at 'highest', "auto" at
    'high'/'fast') or streamed codes can diverge from batch codes on
    RVQ near-ties.
    """
    assert cfg.causal, "streaming requires a causal model"
    assert chunk.shape[1] % cfg.hop_length == 0, \
        (chunk.shape, cfg.hop_length)
    st = state or {}
    new_st: dict = {}
    y, s = _stream_conv(params["init_conv"], chunk, st.get("init"),
                        k=cfg.kernel_size, cfg=cfg, precision=precision,
                        lowering=lowering)
    new_st["init"] = s
    res_states = st.get("res") or [None] * len(params["stages"])
    down_states = st.get("down") or [None] * len(params["stages"])
    new_res, new_down = [], []
    for si, (stage, ratio) in enumerate(zip(params["stages"],
                                            cfg.encoder_ratios)):
        stage_res = res_states[si] or [None] * len(stage["res"])
        stage_new = []
        for j, res_p in enumerate(stage["res"]):
            y, rst = _stream_resblock(res_p, y, stage_res[j], cfg,
                                      [cfg.dilation_base ** j, 1],
                                      precision=precision,
                                      lowering=lowering)
            stage_new.append(rst)
        new_res.append(stage_new)
        y = _act(y, cfg.activation_alpha)
        y, s = _stream_conv(stage["down"], y, down_states[si],
                            k=ratio * 2, s=ratio, cfg=cfg,
                            precision=precision, lowering=lowering)
        new_down.append(s)
    if cfg.lstm:
        y, lstm_state = ops.lstm(params["lstm"], y, skip=True,
                                 state=st.get("lstm"), return_state=True,
                                 precision=precision)
        new_st["lstm"] = lstm_state
    y = _act(y, cfg.activation_alpha)
    y, s = _stream_conv(params["final_conv"], y, st.get("final"),
                        k=cfg.last_kernel_size, cfg=cfg, precision=precision,
                        lowering=lowering)
    new_st.update(res=new_res, down=new_down, final=s)
    return y, new_st


def encoder_stream_finish(params: Params, tail: Array, state: dict,
                          cfg: SEANetConfig,
                          precision=None, lowering: str = "mxu") -> Array:
    """Consume the stream's FINAL partial chunk (`0 < L_tail < hop`) with
    the batch path's end-of-signal padding and return the last latent
    frame(s) `[B, ceil(L_tail/hop), D]`.

    The batch encoder right-pads every conv so its last window is full
    (`get_extra_padding_for_conv1d`, ref conv.py:55-62) — a signal of
    length `L` yields `ceil(L/hop)` frames. Chunked streaming covers the
    first `floor(L/hop)·hop` samples exactly (`encoder_stream_step`); this
    finish step makes the remainder exact too, closing the last gap
    between streamed and offline code extraction (round-2 leftover: the
    old extractor zero-padded the tail and the final frame could differ).
    `state` must come from at least one prior chunk; no state is returned
    — the stream is finished.
    """
    assert cfg.causal, "streaming requires a causal model"
    assert state, "finish requires a primed stream state"
    assert 0 < tail.shape[1] < cfg.hop_length, (tail.shape, cfg.hop_length)
    from ..ops.streaming import sconv1d_stream_finish

    def fin(p, x, st, *, k, s=1, d=1, norm=None):
        return sconv1d_stream_finish(
            p, x, st, kernel_size=k, stride=s, dilation=d,
            norm=cfg.norm if norm is None else norm, pad_mode=cfg.pad_mode,
            precision=precision, lowering=lowering)

    def fin_resblock(p, x, sts, dilations):
        ks, _ = _resblock_dims(cfg, x.shape[-1])
        y = x
        for i, (conv_p, k, d) in enumerate(zip(p["convs"], ks, dilations)):
            y = _act(y, cfg.activation_alpha)
            y = fin(conv_p, y, sts[i], k=k, d=d)
        if "shortcut" in p:
            sc = fin(p["shortcut"], x, sts[len(ks)], k=1)
        else:
            sc = x
        return sc + y

    y = fin(params["init_conv"], tail, state["init"], k=cfg.kernel_size)
    for si, (stage, ratio) in enumerate(zip(params["stages"],
                                            cfg.encoder_ratios)):
        for j, res_p in enumerate(stage["res"]):
            y = fin_resblock(res_p, y, state["res"][si][j],
                             [cfg.dilation_base ** j, 1])
        y = _act(y, cfg.activation_alpha)
        y = fin(stage["down"], y, state["down"][si], k=ratio * 2, s=ratio)
    if cfg.lstm:
        y, _ = ops.lstm(params["lstm"], y, skip=True, state=state["lstm"],
                        return_state=True, precision=precision)
    y = _act(y, cfg.activation_alpha)
    return fin(params["final_conv"], y, state["final"],
               k=cfg.last_kernel_size)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decoder_stream_step(params: Params, z_chunk: Array,
                        state: tp.Optional[dict], cfg: SEANetConfig,
                        precision=None,
                        lowering: str = "auto") -> tp.Tuple[Array, dict]:
    """Decode a `[B, Lz, D]` latent chunk → `[B, Lz*hop, C]` audio.

    `lowering` defaults to "auto", matching the batch `seanet_decoder`
    (inference path) — the two paths then differ only by the documented
    chunk-boundary overlap-add ulps (module docstring), not by lowering.
    """
    assert cfg.causal, "streaming requires a causal model"
    assert cfg.trim_right_ratio == 1.0, \
        "streaming decode requires trim_right_ratio == 1.0"
    if state is None and z_chunk.shape[1] < min_first_latent_chunk(cfg):
        raise ValueError(
            f"first latent chunk ({z_chunk.shape[1]}) is shorter than "
            f"min_first_latent_chunk ({min_first_latent_chunk(cfg)}): the "
            "conv contexts cannot be primed exactly and decode would "
            "silently diverge from the batch path")
    st = state or {}
    new_st: dict = {}
    B = z_chunk.shape[0]
    y, s = _stream_conv(params["init_conv"], z_chunk, st.get("init"),
                        k=cfg.kernel_size, cfg=cfg, precision=precision,
                        lowering=lowering)
    new_st["init"] = s
    if cfg.lstm:
        y, lstm_state = ops.lstm(params["lstm"], y, skip=True,
                                 state=st.get("lstm"), return_state=True,
                                 precision=precision)
        new_st["lstm"] = lstm_state
    up_states = st.get("up") or [None] * len(params["stages"])
    res_states = st.get("res") or [None] * len(params["stages"])
    new_up, new_res = [], []
    for si, (stage, ratio) in enumerate(zip(params["stages"], cfg.ratios)):
        y = _act(y, cfg.activation_alpha)
        carry = up_states[si]
        if carry is None:
            out_ch = stage["up"].get("b").shape[0] if stage["up"].get("b") is not None \
                else None
            if out_ch is None:
                w = stage["up"].get("w", stage["up"].get("v"))
                out_ch = w.shape[2]
            carry = convtr_stream_init(B, out_ch, ratio * 2, ratio, y.dtype)
        y, carry = sconv_transpose1d_stream(
            stage["up"], y, carry, kernel_size=ratio * 2, stride=ratio,
            norm=cfg.norm if cfg.norm in ("none", "weight_norm") else "none",
            precision=precision)
        # module norms (layer_norm) are stateless per-timestep → apply here
        if cfg.norm in ("layer_norm",):
            y = ops.layer_norm(y, stage["up"]["norm"]["scale"],
                               stage["up"]["norm"]["bias"])
        new_up.append(carry)
        stage_res = res_states[si] or [None] * len(stage["res"])
        stage_new = []
        for j, res_p in enumerate(stage["res"]):
            y, rst = _stream_resblock(res_p, y, stage_res[j], cfg,
                                      [cfg.dilation_base ** j, 1],
                                      precision=precision,
                                      lowering=lowering)
            stage_new.append(rst)
        new_res.append(stage_new)
    y = _act(y, cfg.activation_alpha)
    y, s = _stream_conv(params["final_conv"], y, st.get("final"),
                        k=cfg.last_kernel_size, cfg=cfg,
                        norm=cfg.resolved_decoder_final_norm(),
                        precision=precision, lowering=lowering)
    new_st.update(up=new_up, res=new_res, final=s)
    return y, new_st


# ---------------------------------------------------------------------------
# Codec-level convenience
# ---------------------------------------------------------------------------

class StreamingCodec:
    """Chunked encode/decode around an `EncodecModel` (causal models)."""

    def __init__(self, model, n_q: tp.Optional[int] = None):
        from ..quant import rvq_encode, rvq_decode
        self.model = model
        self.cfg = model.cfg
        self.n_q = n_q or model.n_q_active
        self._enc_state: tp.Optional[dict] = None
        self._dec_state: tp.Optional[dict] = None
        self._rvq_encode = rvq_encode
        self._rvq_decode = rvq_decode
        # one compiled executable per (first?, shape, dtype, precision) —
        # chunk steps run dozens of ops each; eager dispatch would pay a
        # host round trip per op on remote devices. Bounded like the
        # model's own jit caches; precision in the key keeps
        # model.set_precision() effective for already-seen shapes.
        from collections import OrderedDict
        self._jit: "OrderedDict[tp.Any, tp.Any]" = OrderedDict()
        self._jit_max = 32

    @property
    def hop(self) -> int:
        return self.cfg.seanet.hop_length

    def reset(self):
        self._enc_state = None
        self._dec_state = None

    @property
    def _precision(self):
        # match the offline model's matmul precision (HIGHEST by default)
        # so streamed codes equal batch codes on TPU as well as CPU
        return getattr(self.model, "_precision", None)

    @property
    def _lowering(self):
        # match the offline model's encode-side conv lowering too:
        # set_precision('high'/'fast') routes batch encode through the VPU
        # shift form, and streamed codes must take the same path
        return getattr(self.model, "_encode_lowering", "mxu")

    def encode_chunk(self, chunk: Array) -> Array:
        """`[B, C, L]` audio chunk (L % hop == 0) → codes `[B, K, L/hop]`."""
        xt = jnp.transpose(jnp.asarray(chunk), (0, 2, 1))
        # n_q is baked into the jitted closure, so it must be part of the
        # key — otherwise mutating codec.n_q after a shape has been seen
        # would silently keep emitting codes at the old bandwidth.
        key = ("enc", self._enc_state is None, xt.shape, str(xt.dtype),
               self._precision, self._lowering, self.n_q)
        if key in self._jit:
            self._jit.move_to_end(key)  # true LRU, not FIFO
        else:
            cfg, precision, n_q = self.cfg, self._precision, self.n_q
            lowering = self._lowering
            rvq_encode = self._rvq_encode
            first = self._enc_state is None

            def fn(params, qstate, x, st):
                emb, st = encoder_stream_step(
                    params["encoder"], x, None if first else st, cfg.seanet,
                    precision=precision, lowering=lowering)
                codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q,
                                   precision=precision)
                return jnp.transpose(codes, (1, 0, 2)), st
            if len(self._jit) >= self._jit_max:
                self._jit.popitem(last=False)
            self._jit[key] = jax.jit(fn)
        codes, self._enc_state = self._jit[key](
            self.model.params, self.model.qstate, xt, self._enc_state)
        return codes

    def encode_finish(self, tail: Array) -> Array:
        """Encode the stream's FINAL partial chunk (`0 < L < hop`) with
        batch-identical end-of-signal padding → codes `[B, K, 1]`.

        After this call the encode stream is finished (state cleared).
        Streamed codes over chunks + finish now equal the offline
        `model.encode` for ANY signal length, not just hop multiples
        (`encoder_stream_finish`)."""
        xt = jnp.transpose(jnp.asarray(tail), (0, 2, 1))
        assert self._enc_state is not None, \
            "encode_finish needs at least one prior encode_chunk"
        key = ("fin", xt.shape, str(xt.dtype), self._precision,
               self._lowering, self.n_q)
        if key in self._jit:
            self._jit.move_to_end(key)
        else:
            cfg, precision, n_q = self.cfg, self._precision, self.n_q
            lowering = self._lowering
            rvq_encode = self._rvq_encode

            def fn(params, qstate, x, st):
                emb = encoder_stream_finish(params["encoder"], x, st,
                                            cfg.seanet, precision=precision,
                                            lowering=lowering)
                codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q,
                                   precision=precision)
                return jnp.transpose(codes, (1, 0, 2))
            if len(self._jit) >= self._jit_max:
                self._jit.popitem(last=False)
            self._jit[key] = jax.jit(fn)
        codes = self._jit[key](self.model.params, self.model.qstate, xt,
                               self._enc_state)
        self._enc_state = None
        return codes

    def decode_chunk(self, codes: Array) -> Array:
        """codes `[B, K, Lq]` → audio `[B, C, Lq*hop]`."""
        codes = jnp.asarray(codes)
        key = ("dec", self._dec_state is None, codes.shape,
               self._precision)
        if key in self._jit:
            self._jit.move_to_end(key)
        else:
            cfg, precision = self.cfg, self._precision
            rvq_decode = self._rvq_decode
            first = self._dec_state is None

            def fn(params, qstate, c, st):
                emb = rvq_decode(qstate, jnp.transpose(c, (1, 0, 2)), cfg.rvq)
                out, st = decoder_stream_step(
                    params["decoder"], emb, None if first else st,
                    cfg.seanet, precision=precision)
                return jnp.transpose(out, (0, 2, 1)), st
            if len(self._jit) >= self._jit_max:
                self._jit.popitem(last=False)
            self._jit[key] = jax.jit(fn)
        out, self._dec_state = self._jit[key](
            self.model.params, self.model.qstate, codes, self._dec_state)
        return out
