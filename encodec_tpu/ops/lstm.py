"""Multi-layer LSTM as a `lax.scan` over time.

TPU-first structure: the input projection `x @ W_ih^T + b` for a whole layer
is hoisted out of the scan and computed as one big `[B*T, C] x [C, 4H]`
matmul on the MXU; the scan body only carries the small recurrent matmul.
Gate packing/order follows torch.nn.LSTM (i, f, g, o) so checkpoints convert
bit-for-bit. Ref behavior: encodec/modules/lstm.py (SLSTM: 2 layers +
residual skip, conv layout).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Params = tp.Dict[str, tp.Any]


def init_lstm(key, dimension: int, num_layers: int = 2,
              hidden: tp.Optional[int] = None) -> Params:
    """Parameters for a stacked LSTM, torch layout per layer:
    w_ih [4H, in], w_hh [4H, H], b_ih [4H], b_hh [4H]."""
    hidden = hidden or dimension
    layers = []
    bound = 1.0 / math.sqrt(hidden)
    for i in range(num_layers):
        in_dim = dimension if i == 0 else hidden
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append({
            "w_ih": jax.random.uniform(k1, (4 * hidden, in_dim), jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(k2, (4 * hidden, hidden), jnp.float32, -bound, bound),
            "b_ih": jax.random.uniform(k3, (4 * hidden,), jnp.float32, -bound, bound),
            "b_hh": jax.random.uniform(k4, (4 * hidden,), jnp.float32, -bound, bound),
        })
    return {"layers": layers}


def _cell(h: Array, c: Array, gates: Array) -> tp.Tuple[Array, Array]:
    """One LSTM cell update given pre-activation gates [B, 4H] (i, f, g, o)."""
    hidden = h.shape[-1]
    i, f, g, o = (gates[..., 0:hidden], gates[..., hidden:2 * hidden],
                  gates[..., 2 * hidden:3 * hidden], gates[..., 3 * hidden:])
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _layer(layer: Params, x: Array, h0: Array, c0: Array,
           precision=None) -> tp.Tuple[Array, Array, Array]:
    """Run one LSTM layer over [B, T, C] → ([B, T, H], hT, cT)."""
    # Hoisted input projection: one MXU matmul for the full sequence.
    x_proj = jnp.einsum("btc,hc->bth", x, layer["w_ih"],
                        precision=precision) + layer["b_ih"] + layer["b_hh"]
    w_hh_t = layer["w_hh"].T

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.dot(h, w_hh_t, precision=precision)
        h, c = _cell(h, c, gates)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, (h0, c0),
                                jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), hT, cT


_LSTM_IMPL = "xla"  # "xla" (lax.scan) | "pallas" (fused kernel)


def set_lstm_impl(impl: str) -> None:
    """Select the full-sequence LSTM backend: "xla" (default) or "pallas"
    (fused VMEM-resident scan, kernels/lstm_pallas.py — zero-state
    non-streaming path only)."""
    global _LSTM_IMPL
    assert impl in ("xla", "pallas"), impl
    _LSTM_IMPL = impl


def lstm(params: Params, x: Array, *, skip: bool = True,
         state: tp.Optional[tp.Tuple[Array, Array]] = None,
         return_state: bool = False, precision=None):
    """Stacked LSTM over `[B, T, C]` with an additive residual skip.

    `state` is an optional `(h, c)` pair of `[num_layers, B, H]` arrays for
    streaming; zeros when omitted (the reference never threads LSTM state —
    SLSTM always starts from zero, lstm.py:24).
    """
    if _LSTM_IMPL == "pallas" and state is None and not return_state:
        from ..kernels.lstm_pallas import lstm_pallas
        # same f32-compute / input-dtype-return contract as the XLA path
        # below: upcast bf16 activations before the kernel (its hoisted
        # input projection runs in the activation dtype) and restore the
        # caller's dtype on exit.
        in_dtype = x.dtype
        if in_dtype != jnp.float32:
            x = x.astype(jnp.float32)
        out = lstm_pallas(params, x, skip=skip, precision=precision)
        return out.astype(in_dtype) if in_dtype != jnp.float32 else out
    # the recurrence is numerically sensitive (carried cell state) and runs
    # at token rate (hop x fewer steps than the conv trunk), so it always
    # computes in f32 — bf16 mixed-precision activations are upcast here
    # and cast back on exit.
    in_dtype = x.dtype
    if in_dtype != jnp.float32:
        x = x.astype(jnp.float32)
    layers = params["layers"]
    B = x.shape[0]
    H = layers[0]["w_hh"].shape[-1]
    if state is None:
        h0 = jnp.zeros((len(layers), B, H), x.dtype)
        c0 = jnp.zeros((len(layers), B, H), x.dtype)
    else:
        # caller-supplied streaming state joins the f32 recurrence (a bf16
        # state would flip the scan carry dtype mid-loop and fail to trace)
        h0, c0 = (s.astype(jnp.float32) for s in state)
    y = x
    hs, cs = [], []
    for i, layer in enumerate(layers):
        y, hT, cT = _layer(layer, y, h0[i], c0[i], precision=precision)
        hs.append(hT)
        cs.append(cT)
    if skip:
        y = y + x
    if in_dtype != jnp.float32:
        y = y.astype(in_dtype)
    if return_state:
        return y, (jnp.stack(hs), jnp.stack(cs))
    return y


def lstm_step(params: Params, x: Array, state: tp.Tuple[Array, Array],
              precision=None):
    """Single-timestep stacked LSTM update for streaming decode.

    x: [B, C]; state: (h, c) each [L, B, H]. Returns (y [B, H], new_state).
    No skip connection applied (caller decides).
    """
    h, c = state
    y = x
    new_h, new_c = [], []
    for i, layer in enumerate(params["layers"]):
        gates = (jnp.dot(y, layer["w_ih"].T, precision=precision)
                 + jnp.dot(h[i], layer["w_hh"].T, precision=precision)
                 + layer["b_ih"] + layer["b_hh"])
        hi, ci = _cell(h[i], c[i], gates)
        new_h.append(hi)
        new_c.append(ci)
        y = hi
    return y, (jnp.stack(new_h), jnp.stack(new_c))
