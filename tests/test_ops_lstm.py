"""Parity tests: ops.lstm vs torch.nn.LSTM / reference SLSTM."""

import numpy as np
import torch

import jax.numpy as jnp

from encodec_tpu import ops
from encodec_tpu.utils import lstm_params_from_torch
from tests import ref_loader

ref_lstm = ref_loader.load("encodec.modules.lstm")


def _np(t):
    return t.detach().numpy()


def test_slstm_parity():
    torch.manual_seed(0)
    dim, B, T = 16, 3, 40
    m = ref_lstm.SLSTM(dim, num_layers=2)
    x = torch.randn(B, dim, T)
    with torch.no_grad():
        y_ref = _np(m(x))  # [B, C, T]
    state = {k: _np(v) for k, v in m.state_dict().items()}
    params = lstm_params_from_torch(state, "lstm.", num_layers=2)
    y = ops.lstm(params, jnp.asarray(_np(x).transpose(0, 2, 1)), skip=True)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-5)


def test_lstm_step_matches_full():
    """Streaming single-step scan equals the full-sequence path."""
    import jax
    key = jax.random.PRNGKey(0)
    dim, B, T = 8, 2, 12
    params = ops.init_lstm(key, dim, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, dim))
    y_full = ops.lstm(params, x, skip=False)
    h = jnp.zeros((2, B, dim))
    c = jnp.zeros((2, B, dim))
    ys = []
    state = (h, c)
    for t in range(T):
        y, state = ops.lstm_step(params, x[:, t], state)
        ys.append(y)
    y_steps = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_steps),
                               rtol=1e-5, atol=1e-6)


def test_lstm_state_threading():
    """Split-sequence evaluation with state equals one-shot evaluation."""
    import jax
    params = ops.init_lstm(jax.random.PRNGKey(2), 8, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 20, 8))
    y_full = ops.lstm(params, x, skip=False)
    y1, st = ops.lstm(params, x[:, :9], skip=False, return_state=True)
    y2 = ops.lstm(params, x[:, 9:], skip=False, state=st)
    np.testing.assert_allclose(np.asarray(y_full),
                               np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               rtol=1e-5, atol=1e-6)
