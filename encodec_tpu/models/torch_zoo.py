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


def torch_state_from_lm_params(p: dict) -> tp.Dict[str, np.ndarray]:
    """Inverse of `lm_params_from_torch`: our LM pytree -> the reference
    `LMModel` state dict (ref model.py:45-83), so LMs trained here drive
    the reference's own --lm compression path."""
    out: tp.Dict[str, np.ndarray] = {}
    n_q = np.asarray(p["emb"]).shape[0]
    for k in range(n_q):
        out[f"emb.{k}.weight"] = np.asarray(p["emb"][k])
        out[f"linears.{k}.weight"] = np.asarray(p["linears"]["w"][k]).T
        out[f"linears.{k}.bias"] = np.asarray(p["linears"]["b"][k])
    out["transformer.norm_in.weight"] = np.asarray(p["norm_in"]["scale"])
    out["transformer.norm_in.bias"] = np.asarray(p["norm_in"]["bias"])
    for i, layer in enumerate(p["layers"]):
        root = f"transformer.layers.{i}."
        out[root + "self_attn.in_proj_weight"] = np.concatenate(
            [np.asarray(layer[h]["w"]).T for h in ("q", "k", "v")], axis=0)
        out[root + "self_attn.in_proj_bias"] = np.concatenate(
            [np.asarray(layer[h]["b"]) for h in ("q", "k", "v")], axis=0)
        out[root + "self_attn.out_proj.weight"] = \
            np.asarray(layer["out"]["w"]).T
        out[root + "self_attn.out_proj.bias"] = np.asarray(layer["out"]["b"])
        out[root + "linear1.weight"] = np.asarray(layer["ff1"]["w"]).T
        out[root + "linear1.bias"] = np.asarray(layer["ff1"]["b"])
        out[root + "linear2.weight"] = np.asarray(layer["ff2"]["w"]).T
        out[root + "linear2.bias"] = np.asarray(layer["ff2"]["b"])
        out[root + "norm1.weight"] = np.asarray(layer["norm1"]["scale"])
        out[root + "norm1.bias"] = np.asarray(layer["norm1"]["bias"])
        out[root + "norm2.weight"] = np.asarray(layer["norm2"]["scale"])
        out[root + "norm2.bias"] = np.asarray(layer["norm2"]["bias"])
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Export: encodec_tpu params -> reference-format state dict (the exact
# inverse of the *_from_torch walkers above). This makes checkpoint
# interchange bidirectional: models trained here load into the reference's
# torch modules unchanged (old-style weight_norm keys `weight_v`/`weight_g`,
# ref conv.py:26-35), and it is what lets the margin audit run on TRAINED
# weights (tests/margin_audit.py audit_trained) — the failure mode random
# weights cannot exhibit.
# ---------------------------------------------------------------------------

def _conv1d_to_torch(p: dict, prefix: str, out: dict) -> None:
    if "v" in p:
        out[f"{prefix}conv.weight_v"] = np.asarray(p["v"]).transpose(2, 1, 0)
        out[f"{prefix}conv.weight_g"] = np.asarray(
            p["g"]).reshape(-1, 1, 1)                       # [Cout,1,1]
    else:
        out[f"{prefix}conv.weight"] = np.asarray(p["w"]).transpose(2, 1, 0)
    if p.get("b") is not None:
        out[f"{prefix}conv.bias"] = np.asarray(p["b"])
    if "norm" in p:
        out[f"{prefix}norm.weight"] = np.asarray(p["norm"]["scale"])
        out[f"{prefix}norm.bias"] = np.asarray(p["norm"]["bias"])


def _convtr_to_torch(p: dict, prefix: str, out: dict) -> None:
    if "v" in p:
        out[f"{prefix}convtr.weight_v"] = np.asarray(p["v"]).transpose(1, 2, 0)
        out[f"{prefix}convtr.weight_g"] = np.asarray(
            p["g"]).reshape(-1, 1, 1)                       # [Cin,1,1]
    else:
        out[f"{prefix}convtr.weight"] = np.asarray(p["w"]).transpose(1, 2, 0)
    if p.get("b") is not None:
        out[f"{prefix}convtr.bias"] = np.asarray(p["b"])
    if "norm" in p:
        out[f"{prefix}norm.weight"] = np.asarray(p["norm"]["scale"])
        out[f"{prefix}norm.bias"] = np.asarray(p["norm"]["bias"])


def _lstm_to_torch(p: dict, prefix: str, out: dict) -> None:
    for i, layer in enumerate(p["layers"]):
        out[f"{prefix}weight_ih_l{i}"] = np.asarray(layer["w_ih"])
        out[f"{prefix}weight_hh_l{i}"] = np.asarray(layer["w_hh"])
        out[f"{prefix}bias_ih_l{i}"] = np.asarray(layer["b_ih"])
        out[f"{prefix}bias_hh_l{i}"] = np.asarray(layer["b_hh"])


def _resblock_to_torch(p: dict, prefix: str, out: dict) -> None:
    for j, conv_p in enumerate(p["convs"]):
        _conv1d_to_torch(conv_p, f"{prefix}block.{2 * j + 1}.conv.", out)
    if "shortcut" in p:
        _conv1d_to_torch(p["shortcut"], f"{prefix}shortcut.conv.", out)


def torch_state_from_params(params: dict, qstate: "RVQState",
                            cfg) -> tp.Dict[str, np.ndarray]:
    """EncodecModel params/qstate -> reference state dict (numpy values).

    Walks the same `nn.Sequential` index sequences as the loaders above.
    `torch_zoo.load_pretrained(model, ...)` of the saved dict reproduces
    the original params exactly (roundtrip-tested), and the dict loads
    into the reference's own `SEANetEncoder/Decoder` +
    `ResidualVectorQuantizer` modules via `load_state_dict`.
    """
    scfg = cfg.seanet
    out: tp.Dict[str, np.ndarray] = {}

    # encoder (mirror of encoder_params_from_torch)
    root, idx = "encoder.model.", 0
    _conv1d_to_torch(params["encoder"]["init_conv"], f"{root}{idx}.conv.", out)
    idx += 1
    for stage in params["encoder"]["stages"]:
        for res_p in stage["res"]:
            _resblock_to_torch(res_p, f"{root}{idx}.", out)
            idx += 1
        idx += 1  # activation module
        _conv1d_to_torch(stage["down"], f"{root}{idx}.conv.", out)
        idx += 1
    if scfg.lstm:
        _lstm_to_torch(params["encoder"]["lstm"], f"{root}{idx}.lstm.", out)
        idx += 1
    idx += 1  # activation
    _conv1d_to_torch(params["encoder"]["final_conv"], f"{root}{idx}.conv.",
                     out)

    # decoder (mirror of decoder_params_from_torch)
    root, idx = "decoder.model.", 0
    _conv1d_to_torch(params["decoder"]["init_conv"], f"{root}{idx}.conv.", out)
    idx += 1
    if scfg.lstm:
        _lstm_to_torch(params["decoder"]["lstm"], f"{root}{idx}.lstm.", out)
        idx += 1
    for stage in params["decoder"]["stages"]:
        idx += 1  # activation
        _convtr_to_torch(stage["up"], f"{root}{idx}.convtr.", out)
        idx += 1
        for res_p in stage["res"]:
            _resblock_to_torch(res_p, f"{root}{idx}.", out)
            idx += 1
    idx += 1  # activation
    _conv1d_to_torch(params["decoder"]["final_conv"], f"{root}{idx}.conv.",
                     out)

    # quantizer buffers (shared-codebook models repeat layer 0's book,
    # which is exactly how the fork's shared instance serializes)
    embed = np.asarray(qstate.embed)
    embed_avg = np.asarray(qstate.embed_avg)
    cluster = np.asarray(qstate.cluster_size)
    inited = float(bool(np.asarray(qstate.inited)))
    for k in range(cfg.rvq.n_q):
        kk = min(k, embed.shape[0] - 1)
        root = f"quantizer.vq.layers.{k}._codebook."
        out[root + "embed"] = embed[kk]
        out[root + "embed_avg"] = embed_avg[kk]
        out[root + "cluster_size"] = cluster[kk]
        out[root + "inited"] = np.asarray([inited], np.float32)
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def save_reference_checkpoint(model, directory: str,
                              name: tp.Optional[str] = None) -> str:
    """Save `model` as a zoo-style `.th` file (sha256 prefix embedded in
    the filename, ref model.py:331-342) and return its path. The file
    loads back via `load_pretrained` and into the reference's own modules.
    """
    import hashlib
    from pathlib import Path

    import torch

    # copy=True: jax-backed arrays are non-writable views, which torch
    # warns about even though we only serialize
    state = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
             for k, v in torch_state_from_params(
                 model.params, model.qstate, model.cfg).items()}
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tmp = directory / "export_tmp.th"
    torch.save(state, tmp)
    sha = hashlib.sha256(tmp.read_bytes()).hexdigest()[:8]
    final = directory / f"{name or model.name}-{sha}.th"
    tmp.rename(final)
    return str(final)


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
