"""Load reference (PyTorch) EnCodec checkpoints into encodec_tpu models.

Handles the published upstream zoo (`encodec_24khz-d7cc33bc.th`,
`encodec_48khz-7e698e3e.th`, LM checkpoints) and fork training checkpoints
(`model.pth` with a `model_state_dict`). The state-dict key layout follows
the reference module tree (encoder.model.{i}..., quantizer.vq.layers.{k}...,
see encodec/modules/seanet.py + encodec/quantization/core_vq.py); this
module walks the same nn.Sequential index sequence from our configs.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from ..quant import RVQConfig, RVQState
from ..utils.convert import (conv1d_params_from_torch,
                             conv_transpose1d_params_from_torch,
                             lstm_params_from_torch, linear_from_torch)
from .seanet import SEANetConfig


def _resblock_from_torch(state, prefix: str, cfg: SEANetConfig) -> dict:
    p: dict = {"convs": []}
    # block = Sequential(act, conv, act, conv): convs at odd indices
    for j in range(2):
        p["convs"].append(conv1d_params_from_torch(
            state, f"{prefix}block.{2 * j + 1}.conv.", norm=cfg.norm))
    if not cfg.true_skip:
        p["shortcut"] = conv1d_params_from_torch(
            state, f"{prefix}shortcut.conv.", norm=cfg.norm)
    return p


def encoder_params_from_torch(state: tp.Mapping[str, np.ndarray],
                              cfg: SEANetConfig,
                              root: str = "encoder.model.") -> dict:
    idx = 0
    p: dict = {"init_conv": conv1d_params_from_torch(
        state, f"{root}{idx}.conv.", norm=cfg.norm), "stages": []}
    idx += 1
    for _ratio in cfg.encoder_ratios:
        stage: dict = {"res": [], "down": None}
        for _j in range(cfg.n_residual_layers):
            stage["res"].append(_resblock_from_torch(state, f"{root}{idx}.", cfg))
            idx += 1
        idx += 1  # activation module
        stage["down"] = conv1d_params_from_torch(
            state, f"{root}{idx}.conv.", norm=cfg.norm)
        idx += 1
        p["stages"].append(stage)
    if cfg.lstm:
        p["lstm"] = lstm_params_from_torch(state, f"{root}{idx}.lstm.",
                                           num_layers=cfg.lstm)
        idx += 1
    idx += 1  # activation
    p["final_conv"] = conv1d_params_from_torch(
        state, f"{root}{idx}.conv.", norm=cfg.norm)
    return p


def decoder_params_from_torch(state: tp.Mapping[str, np.ndarray],
                              cfg: SEANetConfig,
                              root: str = "decoder.model.") -> dict:
    idx = 0
    p: dict = {"init_conv": conv1d_params_from_torch(
        state, f"{root}{idx}.conv.", norm=cfg.norm), "stages": []}
    idx += 1
    if cfg.lstm:
        p["lstm"] = lstm_params_from_torch(state, f"{root}{idx}.lstm.",
                                           num_layers=cfg.lstm)
        idx += 1
    for _ratio in cfg.ratios:
        idx += 1  # activation
        stage: dict = {
            "up": conv_transpose1d_params_from_torch(
                state, f"{root}{idx}.convtr.", norm=cfg.norm),
            "res": [],
        }
        idx += 1
        for _j in range(cfg.n_residual_layers):
            stage["res"].append(_resblock_from_torch(state, f"{root}{idx}.", cfg))
            idx += 1
        p["stages"].append(stage)
    idx += 1  # activation
    p["final_conv"] = conv1d_params_from_torch(
        state, f"{root}{idx}.conv.", norm=cfg.resolved_decoder_final_norm())
    return p


def quantizer_state_from_torch(state: tp.Mapping[str, np.ndarray],
                               cfg: RVQConfig,
                               root: str = "quantizer.vq.layers.") -> RVQState:
    books, avgs, sizes = [], [], []
    for k in range(cfg.num_books):
        books.append(np.asarray(state[f"{root}{k}._codebook.embed"], np.float32))
        avgs.append(np.asarray(state[f"{root}{k}._codebook.embed_avg"], np.float32))
        sizes.append(np.asarray(state[f"{root}{k}._codebook.cluster_size"], np.float32))
    inited = np.asarray(state.get(f"{root}0._codebook.inited", [1.0]))
    return RVQState(
        embed=jnp.asarray(np.stack(books)),
        embed_avg=jnp.asarray(np.stack(avgs)),
        cluster_size=jnp.asarray(np.stack(sizes)),
        inited=jnp.asarray(bool(inited.reshape(-1)[0])),
    )


def model_params_from_torch(state: tp.Mapping[str, np.ndarray], cfg) -> tp.Tuple[dict, RVQState]:
    """Full EncodecModel conversion. `cfg` is an EncodecConfig."""
    params = {
        "encoder": encoder_params_from_torch(state, cfg.seanet),
        "decoder": decoder_params_from_torch(state, cfg.seanet),
    }
    qstate = quantizer_state_from_torch(state, cfg.rvq)
    return params, qstate


def lm_params_from_torch(state: tp.Mapping[str, np.ndarray], n_q: int,
                         num_layers: int = 5) -> dict:
    """Convert the reference LMModel state dict (ref model.py:45-83)."""
    p: dict = {
        "emb": jnp.stack([jnp.asarray(np.asarray(
            state[f"emb.{k}.weight"], np.float32)) for k in range(n_q)]),
        "linears": {
            "w": jnp.stack([jnp.asarray(np.asarray(
                state[f"linears.{k}.weight"], np.float32).T) for k in range(n_q)]),
            "b": jnp.stack([jnp.asarray(np.asarray(
                state[f"linears.{k}.bias"], np.float32)) for k in range(n_q)]),
        },
        "norm_in": {
            "scale": jnp.asarray(np.asarray(state["transformer.norm_in.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(state["transformer.norm_in.bias"], np.float32)),
        },
        "layers": [],
    }
    for i in range(num_layers):
        root = f"transformer.layers.{i}."
        in_proj_w = np.asarray(state[f"{root}self_attn.in_proj_weight"], np.float32)
        in_proj_b = np.asarray(state[f"{root}self_attn.in_proj_bias"], np.float32)
        d = in_proj_w.shape[1]
        layer = {
            "q": {"w": jnp.asarray(in_proj_w[:d].T), "b": jnp.asarray(in_proj_b[:d])},
            "k": {"w": jnp.asarray(in_proj_w[d:2 * d].T), "b": jnp.asarray(in_proj_b[d:2 * d])},
            "v": {"w": jnp.asarray(in_proj_w[2 * d:].T), "b": jnp.asarray(in_proj_b[2 * d:])},
            "out": linear_from_torch(state, f"{root}self_attn.out_proj."),
            "ff1": linear_from_torch(state, f"{root}linear1."),
            "ff2": linear_from_torch(state, f"{root}linear2."),
            "norm1": {"scale": jnp.asarray(np.asarray(state[f"{root}norm1.weight"], np.float32)),
                      "bias": jnp.asarray(np.asarray(state[f"{root}norm1.bias"], np.float32))},
            "norm2": {"scale": jnp.asarray(np.asarray(state[f"{root}norm2.weight"], np.float32)),
                      "bias": jnp.asarray(np.asarray(state[f"{root}norm2.bias"], np.float32))},
        }
        p["layers"].append(layer)
    return p


def load_pretrained(model, checkpoint_name: str,
                    repository: tp.Optional[str] = None) -> None:
    """Load a published `.th` checkpoint into `model` (in place).

    With `repository`, reads `{repository}/{checkpoint_name}` and verifies
    the sha256 prefix embedded in the filename (ref model.py:331-342,
    utils.py:59-76). Without it, attempts the torch.hub download — which
    requires network access.
    """
    import torch

    if repository is not None:
        import hashlib
        from pathlib import Path
        file = Path(repository) / checkpoint_name
        parts = file.stem.split("-")
        if len(parts) > 1:
            checksum = parts[1]
            sha = hashlib.sha256()
            with open(file, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    sha.update(chunk)
            if sha.hexdigest()[:len(checksum)] != checksum:
                raise RuntimeError(f"Invalid checksum for {file}")
        # no embedded checksum (e.g. a fork training checkpoint named
        # model.pth) → nothing to verify, mirroring ref utils.py:59-76
        # which only checks when the filename carries a sha prefix
        state = torch.load(file, map_location="cpu", weights_only=True)
    else:
        url = ("https://dl.fbaipublicfiles.com/encodec/v0/" + checkpoint_name)
        state = torch.hub.load_state_dict_from_url(url, map_location="cpu",
                                                   check_hash=True)
    # fork training checkpoints wrap the weights (ref train.py:504-522)
    if "model_state_dict" in state:
        state = state["model_state_dict"]
    state = {k: v.numpy() for k, v in state.items()}
    params, qstate = model_params_from_torch(state, model.cfg)
    model.params = params
    model.qstate = qstate
