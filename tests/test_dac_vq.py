"""Parity tests for the DAC-style RVQ vs the reference dac_vq module."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from encodec_tpu.quant.dac_vq import (DacRVQConfig, init_dac_rvq,
                                      dac_rvq_forward, dac_from_codes,
                                      dac_from_latents, snake)
from tests import ref_loader

ref_dac_vq = ref_loader.load("encodec.quantization.dac_vq")


def _convert(ref_rvq, cfg: DacRVQConfig) -> dict:
    state = {k: v.detach().numpy() for k, v in ref_rvq.state_dict().items()}
    stages = []
    for i in range(cfg.n_codebooks):
        r = f"quantizers.{i}."
        def wn(prefix):
            v = state[f"{prefix}weight_v"]      # [out, in, 1]
            g = state[f"{prefix}weight_g"]      # [out, 1, 1]
            return {
                "v": jnp.asarray(v[:, :, 0].T),            # [in, out]
                "g": jnp.asarray(g.reshape(-1)),
                "b": jnp.asarray(state[f"{prefix}bias"]),
            }
        stages.append({
            "in_proj": wn(r + "in_proj."),
            "out_proj": wn(r + "out_proj."),
            "codebook": jnp.asarray(state[f"{r}codebook.weight"]),
        })
    return {"stages": stages}


def _wn_check():
    """Our (v,g) folding must match torch weight_norm on [out,in,1]."""
    torch.manual_seed(0)
    conv = ref_dac_vq.WNConv1d(6, 3, kernel_size=1)
    x = torch.randn(2, 6, 5)
    with torch.no_grad():
        y_ref = conv(x).numpy()
    state = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    from encodec_tpu.quant.dac_vq import _wn_linear
    p = {"v": jnp.asarray(state["weight_v"][:, :, 0].T),
         "g": jnp.asarray(state["weight_g"].reshape(-1)),
         "b": jnp.asarray(state["bias"])}
    y = _wn_linear(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-6)


def test_wn_linear_parity():
    _wn_check()


def test_dac_rvq_eval_parity():
    torch.manual_seed(1)
    cfg = DacRVQConfig(input_dim=16, n_codebooks=4, codebook_size=32,
                       codebook_dim=8)
    ref = ref_dac_vq.ResidualVectorQuantize(
        input_dim=16, n_codebooks=4, codebook_size=32, codebook_dim=8,
        quantizer_dropout=0.0)
    ref.eval()
    params = _convert(ref, cfg)
    x = torch.randn(2, 16, 9)
    with torch.no_grad():
        out_ref = ref(x)
    out = dac_rvq_forward(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                          cfg, training=False)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  out_ref.codes.numpy())
    np.testing.assert_allclose(np.asarray(out["z"]).transpose(0, 2, 1),
                               out_ref.quantized.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["latents"]).transpose(0, 2, 1),
        out_ref.latents.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["commitment_loss"]),
                               out_ref.commit_loss.numpy(), rtol=1e-4,
                               atol=1e-6)


def test_dac_from_codes_and_latents_parity():
    torch.manual_seed(2)
    cfg = DacRVQConfig(input_dim=16, n_codebooks=3, codebook_size=32,
                       codebook_dim=8)
    ref = ref_dac_vq.ResidualVectorQuantize(
        input_dim=16, n_codebooks=3, codebook_size=32, codebook_dim=8)
    ref.eval()
    params = _convert(ref, cfg)
    x = torch.randn(2, 16, 7)
    with torch.no_grad():
        out_ref = ref(x)
        zq_ref, zp_ref, _ = ref.from_codes(out_ref.codes)
    codes = jnp.asarray(out_ref.codes.numpy())
    z_q, z_p, _ = dac_from_codes(params, codes)
    np.testing.assert_allclose(np.asarray(z_q).transpose(0, 2, 1),
                               zq_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_p).transpose(0, 2, 1),
                               zp_ref.numpy(), rtol=1e-4, atol=1e-5)

    with torch.no_grad():
        zq2_ref, zp2_ref, codes2_ref = ref.from_latents(out_ref.latents)
    z_q2, z_p2, codes2 = dac_from_latents(
        params, jnp.asarray(out_ref.latents.numpy().transpose(0, 2, 1)), cfg)
    np.testing.assert_array_equal(np.asarray(codes2), codes2_ref.numpy())
    np.testing.assert_allclose(np.asarray(z_q2).transpose(0, 2, 1),
                               zq2_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_quantizer_dropout_and_straight_through():
    cfg = DacRVQConfig(input_dim=8, n_codebooks=3, codebook_size=16,
                       codebook_dim=4, quantizer_dropout=0.5)
    params = init_dac_rvq(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
    out = dac_rvq_forward(params, x, cfg, training=True,
                          rng=jax.random.PRNGKey(2))
    assert out["codes"].shape == (4, 3, 6)
    # gradient flows to the encoder input via straight-through
    g = jax.grad(lambda x: jnp.sum(dac_rvq_forward(
        params, x, cfg, training=True, rng=jax.random.PRNGKey(2))["z"]))(x)
    assert float(jnp.abs(g).sum()) > 0
    # Reference quirk (dac_vq.py:79-85): the fork applies the straight-
    # through estimator *before* computing the codebook loss, so during
    # training the codebook loss carries no gradient to the codebook —
    # unlike original DAC. We reproduce that observable behavior.
    gc = jax.grad(lambda p: jnp.mean(dac_rvq_forward(
        p, x, cfg, training=True,
        rng=jax.random.PRNGKey(2))["codebook_loss"]))(params)
    assert float(jnp.abs(gc["stages"][0]["codebook"]).sum()) == 0
    # in eval (no ST) the same loss does depend on the codebook
    gc_eval = jax.grad(lambda p: jnp.mean(dac_rvq_forward(
        p, x, cfg, training=False)["codebook_loss"]))(params)
    assert float(jnp.abs(gc_eval["stages"][0]["codebook"]).sum()) > 0


def test_snake_parity():
    x = np.linspace(-3, 3, 50, dtype=np.float32)
    xt = torch.tensor(x)
    ref = xt + (1.0 / 1.0) * torch.sin(1.0 * xt).pow(2)  # ref dac.py:24
    np.testing.assert_allclose(np.asarray(snake(jnp.asarray(x))),
                               ref.numpy(), rtol=1e-5, atol=1e-6)
