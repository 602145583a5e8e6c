"""SEANet encoder/decoder — functional, channels-last, jit-friendly.

Behavioral reference: encodec/modules/seanet.py (SEANetEncoder 67-146,
SEANetDecoder 149-253, SEANetResnetBlock 22-64).

Structure (encoder): init conv → per downsampling ratio [res blocks ×R,
ELU, strided conv doubling channels] → LSTM ×2 → ELU, final conv to
`dimension`. The decoder mirrors it with transposed convs. All activations
are `[B, T, C]`; parameters are nested dicts laid out to mirror the module
tree so the torch checkpoint converter is a simple index walk.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops

Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]


@dataclasses.dataclass(frozen=True)
class SEANetConfig:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)   # decoder (upsampling) order
    activation_alpha: float = 1.0                # ELU alpha
    norm: str = "weight_norm"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    trim_right_ratio: float = 1.0                # decoder only
    final_activation: tp.Optional[str] = None    # e.g. 'tanh'
    # The fork hard-codes the decoder's final conv to norm='none'
    # (seanet.py:228); upstream checkpoints need it normed like the rest.
    decoder_final_norm: tp.Optional[str] = None  # None → use `norm`
    # Rematerialize each up/down stage under jax.checkpoint: trades FLOPs
    # for activation memory — needed for 4 h (144k-sample) signals at
    # batch 32 where storing every stage's activations for the backward
    # would blow HBM (SURVEY §7.4).
    remat: bool = False

    @property
    def encoder_ratios(self) -> tp.Tuple[int, ...]:
        return tuple(reversed(self.ratios))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    def resolved_decoder_final_norm(self) -> str:
        return self.norm if self.decoder_final_norm is None else self.decoder_final_norm


def resolve_activation(name: str):
    """Resolve an activation by torch class name ('Tanh', 'ELU') or jax.nn
    name ('tanh') — shared by the offline and sequence-parallel decoders."""
    fn = getattr(jax.nn, name, None) or getattr(jnp, name, None) \
        or getattr(jax.nn, name.lower(), None) or getattr(jnp, name.lower())
    return fn


def _act(x: Array, alpha: float) -> Array:
    return jax.nn.elu(x, alpha=alpha)


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------

def _resblock_dims(cfg: SEANetConfig, dim: int):
    hidden = dim // cfg.compress
    ks = [cfg.residual_kernel_size, 1]
    chans = [(dim, hidden), (hidden, dim)]
    return ks, chans


def init_resblock(key, cfg: SEANetConfig, dim: int, dilations: tp.Sequence[int]) -> Params:
    ks, chans = _resblock_dims(cfg, dim)
    keys = jax.random.split(key, len(ks) + 1)
    convs = [
        ops.init_sconv1d(keys[i], cin, cout, k, norm=cfg.norm)
        for i, (k, (cin, cout)) in enumerate(zip(ks, chans))
    ]
    p: Params = {"convs": convs}
    if not cfg.true_skip:
        p["shortcut"] = ops.init_sconv1d(keys[-1], dim, dim, 1, norm=cfg.norm)
    return p


def apply_resblock(p: Params, x: Array, cfg: SEANetConfig,
                   dilations: tp.Sequence[int], precision=None,
                   lowering: str = "mxu") -> Array:
    ks, _ = _resblock_dims(cfg, x.shape[-1])
    y = x
    for conv_p, k, d in zip(p["convs"], ks, dilations):
        y = _act(y, cfg.activation_alpha)
        y = ops.sconv1d(conv_p, y, kernel_size=k, dilation=d, causal=cfg.causal,
                        norm=cfg.norm, pad_mode=cfg.pad_mode,
                        precision=precision, lowering=lowering)
    if "shortcut" in p:
        sc = ops.sconv1d(p["shortcut"], x, kernel_size=1, causal=cfg.causal,
                         norm=cfg.norm, pad_mode=cfg.pad_mode,
                         precision=precision, lowering=lowering)
    else:
        sc = x
    return sc + y


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def init_seanet_encoder(key, cfg: SEANetConfig) -> Params:
    keys = iter(jax.random.split(key, 64))
    mult = 1
    p: Params = {
        "init_conv": ops.init_sconv1d(next(keys), cfg.channels,
                                      mult * cfg.n_filters, cfg.kernel_size,
                                      norm=cfg.norm),
        "stages": [],
    }
    for ratio in cfg.encoder_ratios:
        stage: Params = {"res": [], "down": None}
        for j in range(cfg.n_residual_layers):
            stage["res"].append(init_resblock(
                next(keys), cfg, mult * cfg.n_filters,
                [cfg.dilation_base ** j, 1]))
        stage["down"] = ops.init_sconv1d(next(keys), mult * cfg.n_filters,
                                         mult * cfg.n_filters * 2,
                                         ratio * 2, norm=cfg.norm)
        p["stages"].append(stage)
        mult *= 2
    if cfg.lstm:
        p["lstm"] = ops.init_lstm(next(keys), mult * cfg.n_filters,
                                  num_layers=cfg.lstm)
    p["final_conv"] = ops.init_sconv1d(next(keys), mult * cfg.n_filters,
                                       cfg.dimension, cfg.last_kernel_size,
                                       norm=cfg.norm)
    return p


def seanet_encoder(p: Params, x: Array, cfg: SEANetConfig,
                   precision=None, lowering: str = "mxu") -> Array:
    """Encode audio `[B, T, channels]` → latents `[B, T/hop, dimension]`.

    `lowering` stays `"mxu"` on the bit-exact parity path ('highest').
    The model's reduced-precision modes ('high'/'fast') pass `"auto"`,
    sending the encoder head's tiny-channel convs (1→32 init, ≤32-channel
    resblocks — 8 of the encoder's 11 ms on v5e) down the VPU shift form;
    whether codes survive is measured by the same margin audit that
    qualifies those modes (tests/margin_audit.py audit_precision).
    """
    y = ops.sconv1d(p["init_conv"], x, kernel_size=cfg.kernel_size,
                    causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
                    precision=precision, lowering=lowering)
    for stage, ratio in zip(p["stages"], cfg.encoder_ratios):
        def stage_fn(stage, y, ratio=ratio):
            for j, res_p in enumerate(stage["res"]):
                y = apply_resblock(res_p, y, cfg, [cfg.dilation_base ** j, 1],
                                   precision=precision, lowering=lowering)
            y = _act(y, cfg.activation_alpha)
            return ops.sconv1d(stage["down"], y, kernel_size=ratio * 2,
                               stride=ratio, causal=cfg.causal, norm=cfg.norm,
                               pad_mode=cfg.pad_mode, precision=precision,
                               lowering=lowering)
        if cfg.remat:
            stage_fn = jax.checkpoint(stage_fn)
        y = stage_fn(stage, y)
    if cfg.lstm:
        y = ops.lstm(p["lstm"], y, skip=True, precision=precision)
    y = _act(y, cfg.activation_alpha)
    y = ops.sconv1d(p["final_conv"], y, kernel_size=cfg.last_kernel_size,
                    causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
                    precision=precision, lowering=lowering)
    return y


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def init_seanet_decoder(key, cfg: SEANetConfig) -> Params:
    keys = iter(jax.random.split(key, 64))
    mult = int(2 ** len(cfg.ratios))
    p: Params = {
        "init_conv": ops.init_sconv1d(next(keys), cfg.dimension,
                                      mult * cfg.n_filters, cfg.kernel_size,
                                      norm=cfg.norm),
        "stages": [],
    }
    if cfg.lstm:
        p["lstm"] = ops.init_lstm(next(keys), mult * cfg.n_filters,
                                  num_layers=cfg.lstm)
    for ratio in cfg.ratios:
        stage: Params = {
            "up": ops.init_sconv_transpose1d(next(keys), mult * cfg.n_filters,
                                             mult * cfg.n_filters // 2,
                                             ratio * 2, norm=cfg.norm),
            "res": [],
        }
        for j in range(cfg.n_residual_layers):
            stage["res"].append(init_resblock(
                next(keys), cfg, mult * cfg.n_filters // 2,
                [cfg.dilation_base ** j, 1]))
        p["stages"].append(stage)
        mult //= 2
    p["final_conv"] = ops.init_sconv1d(
        next(keys), cfg.n_filters, cfg.channels, cfg.last_kernel_size,
        norm=cfg.resolved_decoder_final_norm())
    return p


def seanet_decoder(p: Params, z: Array, cfg: SEANetConfig,
                   precision=None, lowering: str = "auto") -> Array:
    """Decode latents `[B, T, dimension]` → audio `[B, T*hop, channels]`.

    Decoder convs default to `lowering="auto"`: the tail stages run at
    audio resolution with tiny channel counts (≤32, final
    Cout = `channels`), where the shift/VPU form halves end-to-end decode
    on v5e (21.3 → 10.3 ms, 24 kHz B=32×1 s HIGHEST — see
    ops.conv1d_shift). Safe for parity: decode's contract is float
    tolerance (BASELINE.md), unlike the encoder, which keeps the audited
    bit-exact MXU path on the 'highest' codes path. Training passes
    `"mxu"`: the shift form's backward (K slice-grads) measured ~6%
    slower per production step than the fused conv gradient
    (probes/trainab.py: 0.757 vs 0.712 s/step warm), so the VPU form is
    inference-only.
    """
    # the init conv takes `lowering` too: on small decoders its lanes fit
    # the shift threshold, and the streaming decoder applies the lowering
    # uniformly — omitting it here would silently split the two paths
    y = ops.sconv1d(p["init_conv"], z, kernel_size=cfg.kernel_size,
                    causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
                    precision=precision, lowering=lowering)
    if cfg.lstm:
        y = ops.lstm(p["lstm"], y, skip=True, precision=precision)
    for stage, ratio in zip(p["stages"], cfg.ratios):
        def stage_fn(stage, y, ratio=ratio):
            y = _act(y, cfg.activation_alpha)
            y = ops.sconv_transpose1d(stage["up"], y, kernel_size=ratio * 2,
                                      stride=ratio, causal=cfg.causal,
                                      norm=cfg.norm,
                                      trim_right_ratio=cfg.trim_right_ratio,
                                      precision=precision)
            for j, res_p in enumerate(stage["res"]):
                y = apply_resblock(res_p, y, cfg, [cfg.dilation_base ** j, 1],
                                   precision=precision, lowering=lowering)
            return y
        if cfg.remat:
            stage_fn = jax.checkpoint(stage_fn)
        y = stage_fn(stage, y)
    y = _act(y, cfg.activation_alpha)
    y = ops.sconv1d(p["final_conv"], y, kernel_size=cfg.last_kernel_size,
                    causal=cfg.causal, norm=cfg.resolved_decoder_final_norm(),
                    pad_mode=cfg.pad_mode, precision=precision,
                    lowering=lowering)
    if cfg.final_activation is not None:
        y = resolve_activation(cfg.final_activation)(y)
    return y
