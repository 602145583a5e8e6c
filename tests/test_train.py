"""Training-step tests: loss descent, GAN phase, balancer, 8-device mesh."""

import numpy as np
import pytest
# exhaustive parallel/e2e verification tier — run via 'make tests'
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from encodec_tpu.models.model import build_model
from encodec_tpu.models.msstftd import MSSTFTConfig
from encodec_tpu.losses.balancer import Balancer
from encodec_tpu.train import (TrainState, LossWeights, create_train_state,
                               make_train_steps, Metrics,
                               linear_warmup_cosine, save_checkpoint,
                               load_checkpoint)


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    disc_cfg = MSSTFTConfig(filters=2, n_ffts=(64, 32), hop_lengths=(16, 8),
                            win_lengths=(64, 32))
    state, gen_opt, disc_opt = create_train_state(model, disc_cfg, seed=0)
    steps = make_train_steps(model.cfg, disc_cfg,
                             freq_loss_kwargs=dict(n_fft=64, win_length=64,
                                                   hop_length=16,
                                                   sampling_rate=10))
    return model, disc_cfg, state, steps


def _batch(seed=0, B=4, T=600):
    rng = np.random.RandomState(seed)
    t = np.arange(T) / 10.0
    sig = np.sin(2 * np.pi * 0.3 * t)[None, :, None] \
        + 0.05 * rng.randn(B, T, 1)
    return jnp.asarray(sig.astype(np.float32))


def test_gen_step_decreases_loss(tiny_setup):
    model, disc_cfg, state, (gen_step, disc_step, eval_step, _) = tiny_setup
    weights = LossWeights.make(lr=5e-3, freq=0.25)
    batch = _batch()
    losses = []
    for i in range(30):
        state, metrics = gen_step(state, batch, weights, use_gan=False)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses
    # k-means init fired on the first batch
    assert bool(state.qstate.inited)


def test_disc_and_gan_steps(tiny_setup):
    model, disc_cfg, state, (gen_step, disc_step, eval_step, _) = tiny_setup
    weights = LossWeights.make(lr=1e-3, disc_lr=1e-3)
    batch = _batch(1)
    state, m0 = gen_step(state, batch, weights, use_gan=False)
    state, dm = disc_step(state, batch, weights)
    assert np.isfinite(float(dm["loss_disc"]))
    state, gm = gen_step(state, batch, weights, use_gan=True)
    assert "loss_gen" in gm and "loss_feat" in gm
    assert np.isfinite(float(gm["loss"]))
    # a few disc steps should reduce disc loss
    d0 = float(dm["loss_disc"])
    for _ in range(8):
        state, dm = disc_step(state, batch, weights)
    assert float(dm["loss_disc"]) < d0


def test_disc_remat_matches_plain_steps(tiny_setup):
    """`disc_remat=True` changes the memory schedule, not the math: one GAN
    generator step and one discriminator step produce the same metrics and
    the same updated parameters as the plain path."""
    model, disc_cfg, state, (gen_step, disc_step, _, _) = tiny_setup
    gen_r, disc_r, _, _ = make_train_steps(
        model.cfg, disc_cfg, disc_remat=True,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10))
    weights = LossWeights.make(lr=1e-3, disc_lr=1e-3)
    batch = _batch(7)
    s_plain, m_plain = gen_step(state, batch, weights, use_gan=True)
    s_remat, m_remat = gen_r(state, batch, weights, use_gan=True)
    for k in ("loss", "loss_gen", "loss_feat"):
        np.testing.assert_allclose(float(m_plain[k]), float(m_remat[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_remat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    d_plain, dm_plain = disc_step(state, batch, weights)
    d_remat, dm_remat = disc_r(state, batch, weights)
    for k in ("loss_disc", "logits_real", "logits_fake"):
        np.testing.assert_allclose(float(dm_plain[k]), float(dm_remat[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(d_plain.disc_params),
                    jax.tree.leaves(d_remat.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_disc_time_chunk_matches_plain_steps(tiny_setup):
    """MSSTFTConfig.time_chunk (chunk-scanned discriminator with exact halo
    handling) reproduces the whole-signal GAN generator and disc losses —
    including a ragged final chunk and the signal edges."""
    import dataclasses
    model, disc_cfg, state, (gen_step, disc_step, _, _) = tiny_setup
    chunked_cfg = dataclasses.replace(disc_cfg, time_chunk=7)  # ragged tail
    gen_c, disc_c, _, _ = make_train_steps(
        model.cfg, chunked_cfg,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10))
    weights = LossWeights.make(lr=1e-3, disc_lr=1e-3)
    batch = _batch(11)
    s_plain, m_plain = gen_step(state, batch, weights, use_gan=True)
    s_chunk, m_chunk = gen_c(state, batch, weights, use_gan=True)
    for k in ("loss", "loss_gen", "loss_feat"):
        np.testing.assert_allclose(float(m_plain[k]), float(m_chunk[k]),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    d_plain, dm_plain = disc_step(state, batch, weights)
    d_chunk, dm_chunk = disc_c(state, batch, weights)
    for k in ("loss_disc", "logits_real", "logits_fake"):
        np.testing.assert_allclose(float(dm_plain[k]), float(dm_chunk[k]),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(d_plain.disc_params),
                    jax.tree.leaves(d_chunk.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gan_steps_bf16_disc(tiny_setup):
    """Mixed-precision GAN phase: the discriminator's conv stack runs bf16
    (f32 STFT/logits/loss accumulation), composed with disc_remat. Steps
    stay finite and close to the f32 path."""
    model, disc_cfg, state, (gen_f32, disc_f32, _, _) = tiny_setup
    gen_step, disc_step, _, _ = make_train_steps(
        model.cfg, disc_cfg, disc_remat=True, compute_dtype=jnp.bfloat16,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10))
    weights = LossWeights.make(lr=1e-3, disc_lr=1e-3)
    batch = _batch(9)
    s1, m = gen_step(state, batch, weights, use_gan=True)
    _, m32 = gen_f32(state, batch, weights, use_gan=True)
    assert np.isfinite(float(m["loss"]))
    # bf16 fmaps: GAN terms agree with f32 to bf16 tolerance
    np.testing.assert_allclose(float(m["loss_feat"]),
                               float(m32["loss_feat"]), rtol=0.1)
    np.testing.assert_allclose(float(m["loss_gen"]),
                               float(m32["loss_gen"]), rtol=0.1)
    _, dm = disc_step(s1, batch, weights)
    _, dm32 = disc_f32(s1, batch, weights)
    assert np.isfinite(float(dm["loss_disc"]))
    np.testing.assert_allclose(float(dm["loss_disc"]),
                               float(dm32["loss_disc"]), rtol=0.1)


def test_eval_step_and_metrics(tiny_setup):
    model, disc_cfg, state, (gen_step, disc_step, eval_step, _) = tiny_setup
    weights = LossWeights.make()
    metrics, codes, x_hat = eval_step(state, _batch(2), weights)
    assert codes.shape[1] == model.cfg.rvq.n_q
    m = Metrics()
    m.fill_metrics({k: v for k, v in metrics.items()})
    out = m.compute_and_log_metrics()
    assert np.isfinite(out["loss"])


def test_balancer_step():
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    bal = Balancer(weights={"l_t": 1.0, "l_f": 1.0})
    state, _, _ = create_train_state(model, None, seed=1, balancer=bal)
    _, _, _, balanced = make_train_steps(
        model.cfg, None, balancer=bal,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16, sampling_rate=10))
    weights = LossWeights.make(lr=1e-3, commit=0.25)
    st = state
    for _ in range(3):
        st, metrics = balanced(st, _batch(3), weights)
    assert np.isfinite(float(metrics["loss_l_t"]))
    assert "ratio_l_t" in metrics
    assert not np.allclose(np.asarray(jax.tree.leaves(st.params)[0]),
                           np.asarray(jax.tree.leaves(state.params)[0]))


def test_data_parallel_mesh_step():
    """Full train step over the virtual 8-device CPU mesh."""
    from encodec_tpu.parallel import make_mesh
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    disc_cfg = MSSTFTConfig(filters=2, n_ffts=(64,), hop_lengths=(16,),
                            win_lengths=(64,))
    state, _, _ = create_train_state(model, disc_cfg, seed=0)
    gen_step, disc_step, eval_step, _ = make_train_steps(
        model.cfg, disc_cfg, mesh=mesh,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16, sampling_rate=10))
    weights = LossWeights.make(lr=1e-3)
    batch = _batch(4, B=8)
    state, metrics = gen_step(state, batch, weights, use_gan=False)
    state, dm = disc_step(state, batch, weights)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(dm["loss_disc"]))
    # replicated state: every device sees the same embed after the update
    assert bool(state.qstate.inited)


def test_checkpoint_mesh_elasticity(tmp_path):
    """Preemption elasticity: a checkpoint saved from a state trained on an
    8-device mesh resumes cleanly on a 4-device mesh AND on a single
    device, with matching losses and updated params — checkpoints are
    host-numpy trees, so the mesh shape is not baked in (job preempted on
    N chips restarts on M)."""
    from encodec_tpu.parallel import make_mesh
    assert jax.device_count() >= 8
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    disc_cfg = MSSTFTConfig(filters=2, n_ffts=(64,), hop_lengths=(16,),
                            win_lengths=(64,))
    kwargs = dict(freq_loss_kwargs=dict(n_fft=64, win_length=64,
                                        hop_length=16, sampling_rate=10))
    weights = LossWeights.make(lr=1e-3)
    batch = _batch(4, B=8)

    state, _, _ = create_train_state(model, disc_cfg, seed=0)
    gen8, *_ = make_train_steps(model.cfg, disc_cfg, mesh=make_mesh(8),
                                **kwargs)
    state, _ = gen8(state, batch, weights, use_gan=False)
    save_checkpoint(state, epoch=1, path=tmp_path / "m.ckpt")

    def resume():
        restored, epoch, _ = load_checkpoint(tmp_path / "m.ckpt")
        assert epoch == 1
        restored = jax.tree.map(jnp.asarray, restored)
        return restored if isinstance(restored, TrainState) \
            else TrainState(*restored)

    gen1, *_ = make_train_steps(model.cfg, disc_cfg, **kwargs)
    s1, m1 = gen1(resume(), _batch(5, B=8), weights, use_gan=False)

    gen4, *_ = make_train_steps(model.cfg, disc_cfg, mesh=make_mesh(4),
                                **kwargs)
    s4, m4 = gen4(resume(), _batch(5, B=8), weights, use_gan=False)

    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s4.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_checkpoint_untargeted_load_restores_canonical_classes(
        tmp_path, tiny_setup):
    """Loading WITHOUT `target` must still return the framework's own
    state classes (matched by saved name+fields against the fixed module
    allowlist), not synthesized namedtuples — jit caches, `lax.cond`
    branch structures and buffer donation all key on the pytree class.
    Regression: a restored-but-synthesized RVQState made the k-means-init
    `lax.cond` in quant/rvq.py fail on the first post-resume step."""
    from encodec_tpu.quant.rvq import RVQState
    from encodec_tpu.train.steps import TrainState
    _model, _disc_cfg, state, _steps = tiny_setup
    save_checkpoint(state, epoch=0, path=tmp_path / "c.ckpt")
    restored, _, _ = load_checkpoint(tmp_path / "c.ckpt")
    assert type(restored) is TrainState
    assert type(restored.qstate) is RVQState
    assert jax.tree.structure(restored) == jax.tree.structure(state)


def test_scheduler_values():
    # warmup ramps linearly, then cosine to ~0
    lrs = [linear_warmup_cosine(e, 1.0, 10, 100) for e in range(100)]
    np.testing.assert_allclose(lrs[0], 0.1)
    np.testing.assert_allclose(lrs[9], 1.0)
    assert lrs[99] < 1e-3
    assert all(a >= b for a, b in zip(lrs[10:], lrs[11:]))


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, disc_cfg, state, (gen_step, *_rest) = tiny_setup
    weights = LossWeights.make(lr=1e-3)
    state, _ = gen_step(state, _batch(), weights, use_gan=False)
    save_checkpoint(state, epoch=5, path=tmp_path / "ck.ckpt",
                    extra={"exp": "test"})
    restored, epoch, extra = load_checkpoint(tmp_path / "ck.ckpt")
    assert epoch == 5 and extra["exp"] == "test"
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps fine
    resumed = jax.tree.map(jnp.asarray, restored)
    resumed = TrainState(*resumed) if not isinstance(restored, TrainState) else restored
    state2, metrics = gen_step(resumed, _batch(), weights, use_gan=False)
    assert np.isfinite(float(metrics["loss"]))


def test_data_seq_2d_mesh_production_step_matches_single_device():
    """Production-style training step on a 2-D data x seq mesh (batch
    sharded over `data`, TIME sharded over `seq` — XLA inserts the conv
    halo exchanges): losses and updated params must match the unsharded
    step (VERDICT r1 #9)."""
    from encodec_tpu.parallel import make_mesh_2d
    assert jax.device_count() >= 8
    mesh = make_mesh_2d(2, 4)
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    disc_cfg = MSSTFTConfig(filters=2, n_ffts=(64,), hop_lengths=(16,),
                            win_lengths=(64,))
    kwargs = dict(freq_loss_kwargs=dict(n_fft=64, win_length=64,
                                        hop_length=16, sampling_rate=10))
    batch = _batch(4, B=4, T=1200)  # T divisible by 4 shards x hop 10
    weights = LossWeights.make(lr=1e-3)

    state0, _, _ = create_train_state(model, disc_cfg, seed=0)
    gen_ref, disc_ref, _, _ = make_train_steps(model.cfg, disc_cfg, **kwargs)
    sref, mref = gen_ref(state0, batch, weights, use_gan=True)
    sref, dref = disc_ref(sref, batch, weights)

    state1, _, _ = create_train_state(model, disc_cfg, seed=0)
    gen_2d, disc_2d, _, _ = make_train_steps(model.cfg, disc_cfg, mesh=mesh,
                                             **kwargs)
    s2d, m2d = gen_2d(state1, batch, weights, use_gan=True)
    s2d, d2d = disc_2d(s2d, batch, weights)

    np.testing.assert_allclose(float(m2d["loss"]), float(mref["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(d2d["loss_disc"]),
                               float(dref["loss_disc"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s2d.params), jax.tree.leaves(sref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_mixed_precision_bf16_training_converges():
    """compute_dtype=bf16: conv trunks in bf16, f32 masters/losses — the
    tiny fit must converge comparably to the f32 path and keep params f32."""
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    kwargs = dict(freq_loss_kwargs=dict(n_fft=64, win_length=64,
                                        hop_length=16, sampling_rate=10))
    batch = _batch(1, B=8)
    weights = LossWeights.make(lr=1e-3)

    def run(compute_dtype):
        state, _, _ = create_train_state(model, None, seed=0)
        gen_step, *_ = make_train_steps(model.cfg, None,
                                        compute_dtype=compute_dtype, **kwargs)
        losses = []
        for _ in range(40):
            state, m = gen_step(state, batch, weights, use_gan=False)
            losses.append(float(m["loss"]))
        return state, losses

    state16, losses16 = run(jnp.bfloat16)
    _, losses32 = run(None)
    assert all(np.isfinite(losses16))
    assert losses16[-1] < losses16[0] * 0.9
    # master params stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state16.params))
    # same ballpark as the f32 trajectory
    assert losses16[-1] < losses32[0]
    np.testing.assert_allclose(losses16[-1], losses32[-1], rtol=0.35)


def test_warmup_wrap_scheduler():
    """warmup_wrap: linear ramp then the wrapped schedule (ref
    WarmupScheduler semantics)."""
    from encodec_tpu.train.schedulers import warmup_wrap
    import math
    base = lambda e: 0.5 * (1 + math.cos(math.pi * e / 100))
    lrs = [warmup_wrap(e, 1.0, 10, base) for e in range(20)]
    np.testing.assert_allclose(lrs[0], 0.1)
    np.testing.assert_allclose(lrs[9], 1.0)
    np.testing.assert_allclose(lrs[10], base(10))
    assert all(a <= b for a, b in zip(lrs[:10], lrs[1:10]))


def test_spectral_norm_trains_like_torch_buffers():
    """norm='spectral_norm' under the real train step: u/v power-iterate
    every step (torch's training-forward hook) and receive no gradient
    updates; the loss stays finite (review r2 finding)."""
    model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                        model_norm="spectral_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True)
    state, _, _ = create_train_state(model, None, seed=0)
    gen_step, *_ = make_train_steps(
        model.cfg, None,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10))
    weights = LossWeights.make(lr=1e-3)
    batch = _batch(2, B=4)

    def first_sn(params):
        node = params["encoder"]["init_conv"]
        return np.asarray(node["u_sn"]), np.asarray(node["v_sn"])

    u0, v0 = first_sn(state.params)
    state, m = gen_step(state, batch, weights, use_gan=False)
    u1, v1 = first_sn(state.params)
    assert np.isfinite(float(m["loss"]))
    # u/v moved (power iteration ran)...
    assert not np.array_equal(u0, u1)
    # ...and exactly match a manual power iteration from the pre-step
    # weights (i.e. no optimizer gradient contamination; the step iterates
    # BEFORE computing gradients, from the original w_orig/u/v)
    from encodec_tpu.ops.conv import spectral_norm_power_iterate
    orig_model = build_model([0.8], sample_rate=10, channels=1, causal=True,
                             model_norm="spectral_norm",
                             name="breathing_model", ratios=[5, 2, 1],
                             bins=32, dimension=16, n_filters=4,
                             decoder_final_norm="none", shared_codebook=True)
    manual = spectral_norm_power_iterate(
        orig_model.params["encoder"]["init_conv"])
    np.testing.assert_allclose(u1, np.asarray(manual["u_sn"]), rtol=1e-5,
                               atol=1e-6)
