"""Parity tests: spectrogram loss, GAN losses, MS-STFT discriminator,
balancer — vs the reference torch implementations."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from encodec_tpu.losses import (total_loss, disc_loss, reconstruction_loss,
                                Balancer, init_balancer_state, balance)
from encodec_tpu.models.msstftd import (MSSTFTConfig, init_msstftd,
                                        msstftd_forward,
                                        msstftd_params_from_torch)
from tests import ref_loader

ref_losses = ref_loader.load("encodec.my_code.losses")
ref_spec = ref_loader.load("encodec.my_code.spectrogram_loss")
ref_balancer = ref_loader.load("encodec.balancer")


def test_breathing_spectrogram_parity():
    torch.manual_seed(0)
    x = torch.randn(2, 1, 3000)
    ref = ref_spec.BreathingSpectrogram(sampling_rate=10, n_fft=512,
                                        device="cpu")
    with torch.no_grad():
        S_ref = ref(x).numpy()
    from encodec_tpu.losses.spectrogram import breathing_spectrogram
    S = breathing_spectrogram(jnp.asarray(x.numpy()), sampling_rate=10,
                              n_fft=512)
    np.testing.assert_allclose(np.asarray(S), S_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bandwidth", [None, 1.0])
def test_reconstruction_loss_parity(bandwidth):
    torch.manual_seed(1)
    x = torch.randn(2, 1, 3000)
    x_hat = x + 0.1 * torch.randn(2, 1, 3000)
    ref = ref_spec.ReconstructionLoss(alpha=0.01, bandwidth=bandwidth,
                                      sampling_rate=10, n_fft=512,
                                      device="cpu")
    with torch.no_grad():
        out_ref = ref(x, x_hat)
    out = reconstruction_loss(jnp.asarray(x.numpy()),
                              jnp.asarray(x_hat.numpy()), alpha=0.01,
                              bandwidth=bandwidth, sampling_rate=10,
                              n_fft=512)
    for k in ["total_loss", "l1_loss", "l2_loss", "acc"]:
        np.testing.assert_allclose(float(out[k]), float(out_ref[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_msstftd_parity():
    torch.manual_seed(2)
    ref_mod = ref_loader.load("encodec.msstftd")
    cfg = MSSTFTConfig(filters=4, n_ffts=(64, 128), hop_lengths=(16, 32),
                       win_lengths=(64, 128))
    disc = ref_mod.MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=[64, 128], hop_lengths=[16, 32],
        win_lengths=[64, 128])
    disc.eval()
    state = {k: v.detach().numpy() for k, v in disc.state_dict().items()}
    params = msstftd_params_from_torch(state, cfg)
    x = torch.randn(2, 1, 1500)
    with torch.no_grad():
        logits_ref, fmaps_ref = disc(x)
    logits, fmaps = msstftd_forward(params, jnp.asarray(
        x.numpy().transpose(0, 2, 1)), cfg)
    assert len(logits) == 2 and all(len(f) == 5 for f in fmaps)
    for k in range(2):
        # ours is NHWC (t, w, c); reference NCHW (c, t, w)
        got = np.asarray(logits[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, logits_ref[k].numpy(),
                                   rtol=1e-4, atol=1e-4)
        for l in range(5):
            got = np.asarray(fmaps[k][l]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, fmaps_ref[k][l].numpy(),
                                       rtol=1e-4, atol=1e-4)


def test_msstftd_conv_taps_matches_xla():
    """conv_impl='taps' (per-tap matmuls; im2col-free weight gradients)
    reproduces the XLA conv path — outputs AND weight gradients — across
    the discriminator's stride/dilation plan."""
    import dataclasses
    from encodec_tpu.models.msstftd import init_msstftd
    cfg = MSSTFTConfig(filters=4, n_ffts=(64, 128), hop_lengths=(16, 32),
                       win_lengths=(64, 128))
    cfg_taps = dataclasses.replace(cfg, conv_impl="taps")
    params = init_msstftd(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 1500, 1), np.float32)

    logits, fmaps = msstftd_forward(params, x, cfg)
    logits_t, fmaps_t = msstftd_forward(params, x, cfg_taps)
    for a, b in zip(jax.tree.leaves((logits, fmaps)),
                    jax.tree.leaves((logits_t, fmaps_t))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def loss(p, impl_cfg):
        lg, _ = msstftd_forward(p, x, impl_cfg)
        return sum(jnp.mean(jnp.square(1.0 - l)) for l in lg)

    g_xla = jax.grad(loss)(params, cfg)
    g_taps = jax.grad(loss)(params, cfg_taps)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_taps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gan_losses_parity():
    torch.manual_seed(3)
    ref_mod = ref_loader.load("encodec.msstftd")
    disc = ref_mod.MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=[64, 128], hop_lengths=[16, 32],
        win_lengths=[64, 128])
    disc.eval()
    x = torch.randn(2, 1, 1200)
    x_hat = x + 0.05 * torch.randn_like(x)
    with torch.no_grad():
        logits_real, fmap_real = disc(x)
        logits_fake, fmap_fake = disc(x_hat)
        ref_out = ref_losses.total_loss(fmap_real, logits_fake, fmap_fake,
                                        x, x_hat)
        ref_d = ref_losses.disc_loss(logits_real, logits_fake)

    to_j = lambda t: jnp.asarray(t.numpy())
    out = total_loss([[to_j(f) for f in fm] for fm in fmap_real],
                     [to_j(l) for l in logits_fake],
                     [[to_j(f) for f in fm] for fm in fmap_fake],
                     to_j(x), to_j(x_hat))
    for k in ["l_1", "l_2", "l_g", "l_feat"]:
        np.testing.assert_allclose(float(out[k]), float(ref_out[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(out["l_t"]),
                               ref_out["l_t"].numpy(), rtol=1e-5)
    d = disc_loss([to_j(l) for l in logits_real],
                  [to_j(l) for l in logits_fake])
    np.testing.assert_allclose(float(d), float(ref_d), rtol=1e-5)


def test_balancer_matches_reference_test_values():
    """Same exact expectations as the reference balancer.test()
    (balancer.py:121-139)."""
    x = jnp.zeros((1,))

    def loss_1(x):
        return jnp.mean(jnp.abs(x - 1.0))

    def loss_2(x):
        return 100.0 * jnp.mean(jnp.abs(x + 1.0))

    b = Balancer(weights={"1": 1, "2": 1}, rescale_grads=False)
    st = init_balancer_state(b)
    grad, losses, st, _ = balance(b, {"1": loss_1, "2": loss_2}, x, st)
    np.testing.assert_allclose(np.asarray(grad), [99.0], rtol=1e-6)

    b = Balancer(weights={"1": 1, "2": 1}, rescale_grads=True)
    st = init_balancer_state(b)
    grad, losses, st, metrics = balance(b, {"1": loss_1, "2": loss_2}, x, st)
    np.testing.assert_allclose(np.asarray(grad), [0.0], atol=1e-6)
    assert abs(float(metrics["ratio_1"]) - 0.0099) < 1e-3


def test_balancer_vjp_roundtrip():
    """Balanced cotangent backprops through a generator via vjp."""
    def gen(w, x):
        return jnp.tanh(x * w)

    w = jnp.asarray(2.0)
    x = jnp.linspace(-1, 1, 8).reshape(1, 8)
    b = Balancer(weights={"a": 1.0, "b": 4.0})
    st = init_balancer_state(b)
    x_hat, vjp_fn = jax.vjp(lambda w: gen(w, x), w)
    cot, losses, st, _ = balance(
        b, {"a": lambda y: jnp.mean(jnp.abs(y - 1)),
            "b": lambda y: jnp.mean(jnp.square(y))}, x_hat, st)
    (gw,) = vjp_fn(cot)
    assert np.isfinite(float(gw))


def test_averager_parity():
    from encodec_tpu.losses import averager
    ref_avg = ref_balancer.averager(beta=0.9)
    avg = averager(beta=0.9)
    for i in range(5):
        metrics = {"a": float(i), "b": float(2 * i + 1)}
        got = avg(metrics, weight=1.0 + 0.1 * i)
        want = ref_avg(metrics, weight=1.0 + 0.1 * i)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9
