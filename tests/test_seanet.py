"""Parity tests: SEANet encoder/decoder vs the reference torch modules."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from encodec_tpu.models.seanet import (SEANetConfig, seanet_encoder,
                                       seanet_decoder)
from encodec_tpu.models.torch_zoo import (encoder_params_from_torch,
                                          decoder_params_from_torch)
from tests import ref_loader

ref_seanet = ref_loader.load("encodec.modules.seanet")


def _np(t):
    return t.detach().numpy()


def _state(mod, root=""):
    return {root + k: _np(v) for k, v in mod.state_dict().items()}


CONFIGS = {
    # 24 kHz-style: causal, weight_norm (tiny widths for test speed)
    "24k_style": dict(channels=1, dimension=16, n_filters=4, ratios=[8, 5, 4, 2],
                      causal=True, norm="weight_norm"),
    # 48 kHz-style: non-causal, time_group_norm, stereo
    "48k_style": dict(channels=2, dimension=16, n_filters=4, ratios=[8, 5, 4, 2],
                      causal=False, norm="time_group_norm"),
    # breathing fork style: layer_norm, causal, 5 ratios
    "breathing": dict(channels=1, dimension=8, n_filters=4, ratios=[6, 5, 5, 2, 1],
                      causal=True, norm="layer_norm"),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_encoder_parity(name):
    kw = CONFIGS[name]
    torch.manual_seed(0)
    enc = ref_seanet.SEANetEncoder(**kw)
    enc.eval()
    cfg = SEANetConfig(channels=kw["channels"], dimension=kw["dimension"],
                       n_filters=kw["n_filters"], ratios=tuple(kw["ratios"]),
                       causal=kw["causal"], norm=kw["norm"])
    params = encoder_params_from_torch(_state(enc, "encoder.model."), cfg,
                                       root="encoder.model.model.")
    T = int(np.prod(kw["ratios"])) * 4 + 13
    x = torch.randn(2, kw["channels"], T)
    with torch.no_grad():
        y_ref = _np(enc(x))
    y = seanet_encoder(params, jnp.asarray(_np(x).transpose(0, 2, 1)), cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_decoder_parity(name):
    kw = CONFIGS[name]
    torch.manual_seed(1)
    dec_kw = dict(kw)
    dec = ref_seanet.SEANetDecoder(**dec_kw)
    dec.eval()
    # The fork hard-codes the decoder's final conv to norm='none'
    # (seanet.py:228) — mirror that with decoder_final_norm.
    cfg = SEANetConfig(channels=kw["channels"], dimension=kw["dimension"],
                       n_filters=kw["n_filters"], ratios=tuple(kw["ratios"]),
                       causal=kw["causal"], norm=kw["norm"],
                       decoder_final_norm="none")
    params = decoder_params_from_torch(_state(dec, "decoder.model."), cfg,
                                       root="decoder.model.model.")
    Tz = 7
    z = torch.randn(2, kw["dimension"], Tz)
    with torch.no_grad():
        y_ref = _np(dec(z))
    y = seanet_decoder(params, jnp.asarray(_np(z).transpose(0, 2, 1)), cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-4, atol=1e-4)


def test_encoder_decoder_shape_inverse():
    """Ref seanet.test(): decoder(encoder(x)) restores the input length."""
    import jax
    cfg = SEANetConfig(channels=1, dimension=8, n_filters=2,
                       ratios=(8, 5, 4, 2), causal=False, norm="none")
    from encodec_tpu.models.seanet import (init_seanet_encoder,
                                           init_seanet_decoder)
    ep = init_seanet_encoder(jax.random.PRNGKey(0), cfg)
    dp = init_seanet_decoder(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 14400, 1))
    z = seanet_encoder(ep, x, cfg)
    assert z.shape == (1, 14400 // 320, 8)
    y = seanet_decoder(dp, z, cfg)
    assert y.shape == x.shape


def test_remat_identical_forward_and_grads():
    """jax.checkpoint per stage changes memory, not math."""
    import dataclasses
    import jax
    from encodec_tpu.models.seanet import (init_seanet_encoder,
                                           init_seanet_decoder)
    cfg = SEANetConfig(channels=1, dimension=8, n_filters=4,
                       ratios=(4, 2), causal=True, norm="layer_norm",
                       decoder_final_norm="none")
    cfg_r = dataclasses.replace(cfg, remat=True)
    ep = init_seanet_encoder(jax.random.PRNGKey(0), cfg)
    dp = init_seanet_decoder(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 160, 1))

    def loss(params, c):
        z = seanet_encoder(params["e"], x, c)
        y = seanet_decoder(params["d"], z, c)
        return jnp.mean(jnp.square(y))

    import jax.numpy as jnp
    params = {"e": ep, "d": dp}
    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_extended_config_knobs_parity():
    """Knobs no standard config uses: n_residual_layers=2, dilation_base=3,
    true_skip, compress=4, no LSTM, tanh final activation."""
    import torch
    from encodec_tpu.models.torch_zoo import (encoder_params_from_torch,
                                              decoder_params_from_torch)
    torch.manual_seed(7)
    kw = dict(channels=1, dimension=8, n_filters=4, ratios=[4, 2],
              n_residual_layers=2, dilation_base=3, true_skip=True,
              compress=4, lstm=0, causal=True, norm="weight_norm")
    enc = ref_seanet.SEANetEncoder(**kw)
    dec = ref_seanet.SEANetDecoder(final_activation="Tanh", **kw)
    enc.eval(); dec.eval()
    cfg = SEANetConfig(channels=1, dimension=8, n_filters=4, ratios=(4, 2),
                       n_residual_layers=2, dilation_base=3, true_skip=True,
                       compress=4, lstm=0, causal=True, norm="weight_norm",
                       final_activation="Tanh", decoder_final_norm="none")
    ep = encoder_params_from_torch(
        {"encoder.model." + k: v.detach().numpy()
         for k, v in enc.state_dict().items()}, cfg,
        root="encoder.model.model.")
    dp = decoder_params_from_torch(
        {"decoder.model." + k: v.detach().numpy()
         for k, v in dec.state_dict().items()}, cfg,
        root="decoder.model.model.")

    x = torch.randn(2, 1, 163)
    with torch.no_grad():
        z_ref = enc(x).numpy()
    z = seanet_encoder(ep, jnp.asarray(x.numpy().transpose(0, 2, 1)), cfg)
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1), z_ref,
                               rtol=1e-5, atol=1e-5)

    zt = torch.randn(2, 8, 9)
    with torch.no_grad():
        y_ref = dec(zt).numpy()
    y = seanet_decoder(dp, jnp.asarray(zt.numpy().transpose(0, 2, 1)), cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-5)
