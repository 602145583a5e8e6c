"""Convert PyTorch state-dict tensors into encodec_tpu parameter pytrees.

Used by the pretrained-checkpoint loader (the published EnCodec `.th` zoo and
fork training checkpoints) and by the parity test suite. Only depends on
numpy — tensors should be passed as numpy arrays (`t.detach().numpy()`).

Layout map:
    torch Conv1d weight           [Cout, Cin, K]  -> WIO [K, Cin, Cout]
    torch ConvTranspose1d weight  [Cin, Cout, K]  -> WIO [K, Cin, Cout]
    torch weight_norm             weight_g/weight_v (old) or
                                  parametrizations.weight.original0/1 (new)
    torch LSTM                    weight_ih_l{n} [4H, in], gate order i,f,g,o
"""

from __future__ import annotations

import typing as tp

import numpy as np
import jax.numpy as jnp


def _get(state: tp.Mapping[str, np.ndarray], key: str) -> np.ndarray:
    v = state[key]
    return np.asarray(v, dtype=np.float32)


def conv1d_params_from_torch(state: tp.Mapping[str, np.ndarray], prefix: str,
                             norm: str = "none") -> dict:
    """Convert `{prefix}.conv.*` of a reference NormConv1d/SConv1d.

    `prefix` should address the NormConv1d level, i.e. contain `conv.weight`
    (or weight-norm keys) and optionally `conv.bias` plus `norm.{weight,bias}`.
    """
    p: dict = {}
    wn_keys = (f"{prefix}conv.weight_v", f"{prefix}conv.parametrizations.weight.original1")
    if norm == "weight_norm" or any(k in state for k in wn_keys):
        if f"{prefix}conv.weight_v" in state:
            v = _get(state, f"{prefix}conv.weight_v")
            g = _get(state, f"{prefix}conv.weight_g")
        else:
            g = _get(state, f"{prefix}conv.parametrizations.weight.original0")
            v = _get(state, f"{prefix}conv.parametrizations.weight.original1")
        p["v"] = jnp.asarray(v.transpose(2, 1, 0))       # [K, Cin, Cout]
        p["g"] = jnp.asarray(g.reshape(-1))              # [Cout]
    else:
        w = _get(state, f"{prefix}conv.weight")
        p["w"] = jnp.asarray(w.transpose(2, 1, 0))
    if f"{prefix}conv.bias" in state:
        p["b"] = jnp.asarray(_get(state, f"{prefix}conv.bias"))
    if norm in ("layer_norm", "time_group_norm"):
        p["norm"] = {
            "scale": jnp.asarray(_get(state, f"{prefix}norm.weight")),
            "bias": jnp.asarray(_get(state, f"{prefix}norm.bias")),
        }
    return p


def conv_transpose1d_params_from_torch(state: tp.Mapping[str, np.ndarray],
                                       prefix: str, norm: str = "none") -> dict:
    """Convert `{prefix}convtr.*` of a reference NormConvTranspose1d."""
    p: dict = {}
    if norm == "weight_norm" or f"{prefix}convtr.weight_v" in state or \
            f"{prefix}convtr.parametrizations.weight.original1" in state:
        if f"{prefix}convtr.weight_v" in state:
            v = _get(state, f"{prefix}convtr.weight_v")
            g = _get(state, f"{prefix}convtr.weight_g")
        else:
            g = _get(state, f"{prefix}convtr.parametrizations.weight.original0")
            v = _get(state, f"{prefix}convtr.parametrizations.weight.original1")
        p["v"] = jnp.asarray(v.transpose(2, 0, 1))       # [K, Cin, Cout]
        p["g"] = jnp.asarray(g.reshape(-1))              # [Cin] (torch dim=0)
    else:
        w = _get(state, f"{prefix}convtr.weight")
        p["w"] = jnp.asarray(w.transpose(2, 0, 1))
    if f"{prefix}convtr.bias" in state:
        p["b"] = jnp.asarray(_get(state, f"{prefix}convtr.bias"))
    if norm in ("layer_norm", "time_group_norm"):
        p["norm"] = {
            "scale": jnp.asarray(_get(state, f"{prefix}norm.weight")),
            "bias": jnp.asarray(_get(state, f"{prefix}norm.bias")),
        }
    return p


def lstm_params_from_torch(state: tp.Mapping[str, np.ndarray], prefix: str,
                           num_layers: int) -> dict:
    layers = []
    for i in range(num_layers):
        layers.append({
            "w_ih": jnp.asarray(_get(state, f"{prefix}weight_ih_l{i}")),
            "w_hh": jnp.asarray(_get(state, f"{prefix}weight_hh_l{i}")),
            "b_ih": jnp.asarray(_get(state, f"{prefix}bias_ih_l{i}")),
            "b_hh": jnp.asarray(_get(state, f"{prefix}bias_hh_l{i}")),
        })
    return {"layers": layers}


def linear_from_torch(state: tp.Mapping[str, np.ndarray], prefix: str) -> dict:
    p = {"w": jnp.asarray(_get(state, f"{prefix}weight").T)}  # [in, out]
    if f"{prefix}bias" in state:
        p["b"] = jnp.asarray(_get(state, f"{prefix}bias"))
    return p
