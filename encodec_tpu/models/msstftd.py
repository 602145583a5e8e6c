"""Multi-Scale STFT discriminator (GAN critic for codec training).

Behavioral reference: encodec/msstftd.py (DiscriminatorSTFT 28-96,
MultiScaleSTFTDiscriminator 99-129): N sub-discriminators at different STFT
resolutions; each turns the complex STFT into 2C real channels and runs a
small Conv2d stack (time-dilated) with LeakyReLU, returning logits and five
feature maps for the feature-matching loss.

Layout: NHWC with H=time-frames, W=freq-bins — conv strides walk the
frequency axis like the reference's (1, 2) stride after its `b c w t ->
b c t w` rearrange.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..ops.conv2d import init_conv2d, conv2d, conv2d_params_from_torch
from ..ops.stft import spectrogram

Array = jnp.ndarray


def _get_2d_padding(kernel_size, dilation=(1, 1)):
    return (((kernel_size[0] - 1) * dilation[0]) // 2,
            ((kernel_size[1] - 1) * dilation[1]) // 2)


@dataclasses.dataclass(frozen=True)
class MSSTFTConfig:
    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: tp.Tuple[int, ...] = (1024, 2048, 512)
    hop_lengths: tp.Tuple[int, ...] = (256, 512, 128)
    win_lengths: tp.Tuple[int, ...] = (1024, 2048, 512)
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tp.Tuple[int, int] = (3, 9)
    dilations: tp.Tuple[int, ...] = (1, 2, 4)
    stride: tp.Tuple[int, int] = (1, 2)
    normalized: bool = True
    norm: str = "weight_norm"
    leaky_slope: float = 0.2
    # "taps" overrides each conv's WEIGHT gradient with per-kernel-tap
    # contractions (forward and input gradient stay XLA convs) so the
    # backward never materializes im2col patches — required for GAN
    # training on 4 h signals on a single chip (ops/conv2d.py).
    conv_impl: str = "xla"

    @property
    def num_discriminators(self) -> int:
        return len(self.n_ffts)


def _sub_channel_plan(cfg: MSSTFTConfig):
    """(in, out, stride, dilation, padding, norm) per conv of one sub-disc."""
    ks = cfg.kernel_size
    spec_channels = 2 * cfg.in_channels
    plan = []
    # first conv: the reference constructs it without a norm → 'none'
    plan.append((spec_channels, cfg.filters, (1, 1), (1, 1),
                 _get_2d_padding(ks), ks, "none"))
    in_chs = min(cfg.filters_scale * cfg.filters, cfg.max_filters)
    for i, dilation in enumerate(cfg.dilations):
        out_chs = min((cfg.filters_scale ** (i + 1)) * cfg.filters,
                      cfg.max_filters)
        plan.append((in_chs, out_chs, cfg.stride, (dilation, 1),
                     _get_2d_padding(ks, (dilation, 1)), ks, cfg.norm))
        in_chs = out_chs
    out_chs = min((cfg.filters_scale ** (len(cfg.dilations) + 1)) * cfg.filters,
                  cfg.max_filters)
    sq = (ks[0], ks[0])
    plan.append((in_chs, out_chs, (1, 1), (1, 1), _get_2d_padding(sq), sq,
                 cfg.norm))
    # conv_post
    plan.append((out_chs, cfg.out_channels, (1, 1), (1, 1),
                 _get_2d_padding(sq), sq, cfg.norm))
    return plan


def init_msstftd(key, cfg: MSSTFTConfig) -> dict:
    discs = []
    for i in range(cfg.num_discriminators):
        key, sub = jax.random.split(key)
        convs = []
        for (cin, cout, _s, _d, _p, k, norm) in _sub_channel_plan(cfg):
            sub, ck = jax.random.split(sub)
            convs.append(init_conv2d(ck, cin, cout, k, norm=norm))
        discs.append({"convs": convs})
    return {"discs": discs}


def _sub_forward(params: dict, x: Array, cfg: MSSTFTConfig, n_fft: int,
                 hop: int, win: int, precision=None, compute_dtype=None):
    """x: [B, T, C] → (logits [B, t, w, out_ch], fmaps).

    `compute_dtype=bfloat16` runs the conv stack (and hence the stored
    feature maps) in bf16 — the STFT stays f32 (FFT twiddle precision),
    the logits are returned f32, and weights are cast from f32 masters
    inside `conv2d`. Halves the discriminator's activation memory on top
    of `disc_remat` and doubles its MXU rate.
    """
    xc = jnp.swapaxes(x, 1, 2)                     # [B, C, T]
    spec = spectrogram(xc, n_fft, hop, win, normalized=cfg.normalized,
                       power=None)                  # [B, C, freq, frames] cplx
    z = jnp.concatenate([spec.real, spec.imag], axis=1)  # [B, 2C, w, t]
    z = jnp.transpose(z, (0, 3, 2, 1))             # [B, t, w, 2C] (NHWC)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    fmap = []
    plan = _sub_channel_plan(cfg)
    for p, (cin, cout, stride, dil, pad, k, norm) in zip(
            params["convs"][:-1], plan[:-1]):
        z = conv2d(p, z, stride=stride, dilation=dil, padding=pad,
                   precision=precision, impl=cfg.conv_impl)
        z = jax.nn.leaky_relu(z, cfg.leaky_slope)
        fmap.append(z)
    (cin, cout, stride, dil, pad, k, norm) = plan[-1]
    z = conv2d(params["convs"][-1], z, stride=stride, dilation=dil,
               padding=pad, precision=precision, impl=cfg.conv_impl)
    return z.astype(jnp.float32), fmap


def msstftd_forward(params: dict, x: Array, cfg: MSSTFTConfig,
                    precision=None, compute_dtype=None):
    """x: [B, T, C] audio → (logits list, fmaps list-of-lists)."""
    logits, fmaps = [], []
    for i, sub in enumerate(params["discs"]):
        logit, fmap = _sub_forward(sub, x, cfg, cfg.n_ffts[i],
                                   cfg.hop_lengths[i], cfg.win_lengths[i],
                                   precision=precision,
                                   compute_dtype=compute_dtype)
        logits.append(logit)
        fmaps.append(fmap)
    return logits, fmaps


def msstftd_num_fmaps(cfg: MSSTFTConfig) -> int:
    """Feature maps per sub-discriminator (every conv but conv_post)."""
    return len(_sub_channel_plan(cfg)) - 1


def msstftd_sub_forward(sub_params: dict, x: Array, cfg: MSSTFTConfig,
                        i: int, precision=None, compute_dtype=None):
    """One sub-discriminator's `(logits, fmaps)` — the unit the rematerialized
    GAN steps (`train.steps` with `disc_remat`) recompute in the backward so
    that no more than one resolution's activations are ever live."""
    return _sub_forward(sub_params, x, cfg, cfg.n_ffts[i],
                        cfg.hop_lengths[i], cfg.win_lengths[i],
                        precision=precision, compute_dtype=compute_dtype)


def msstftd_params_from_torch(state, cfg: MSSTFTConfig,
                              root: str = "discriminators.") -> dict:
    discs = []
    for i in range(cfg.num_discriminators):
        convs = []
        plan = _sub_channel_plan(cfg)
        for j, (_cin, _cout, _s, _d, _p, _k, norm) in enumerate(plan[:-1]):
            convs.append(conv2d_params_from_torch(
                state, f"{root}{i}.convs.{j}.", norm=norm))
        convs.append(conv2d_params_from_torch(
            state, f"{root}{i}.conv_post.", norm=plan[-1][-1]))
        discs.append({"convs": convs})
    return {"discs": discs}
