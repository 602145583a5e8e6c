"""Pretrained-zoo loading path: a reference-format `.th` checkpoint (sha256
prefix in the filename) loads into the real 24 kHz architecture and
reproduces the torch pipeline's codes exactly."""

import hashlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import ref_loader

ref_seanet = ref_loader.load("encodec.modules.seanet")
core_vq = ref_loader.load("encodec.quantization.core_vq")
ref_vq = ref_loader.load("encodec.quantization.vq")


@pytest.mark.slow
def test_pretrained_24khz_checkpoint_loading(tmp_path):
    torch.manual_seed(0)
    # full-size 24 kHz architecture with *independent* per-stage codebooks,
    # exactly the upstream checkpoint layout
    enc = ref_seanet.SEANetEncoder(channels=1, dimension=128, n_filters=32,
                                   ratios=[8, 5, 4, 2], causal=True,
                                   norm="weight_norm")
    dec = ref_seanet.SEANetDecoder(channels=1, dimension=128, n_filters=32,
                                   ratios=[8, 5, 4, 2], causal=True,
                                   norm="weight_norm")
    quant = ref_vq.ResidualVectorQuantizer(dimension=128, n_q=32, bins=1024,
                                           codebook_dim=128,
                                           kmeans_init=False)
    quant.vq.layers = torch.nn.ModuleList(
        [core_vq.VectorQuantization(dim=128, codebook_size=1024,
                                    codebook_dim=128, kmeans_init=False)
         for _ in range(32)])
    for m in (enc, dec, quant):
        m.eval()

    state = {}
    for root, m in [("encoder.", enc), ("decoder.", dec),
                    ("quantizer.", quant)]:
        for k, v in m.state_dict().items():
            state[root + k] = v

    # the fork's decoder drops the final conv's weight norm; upstream
    # checkpoints keep it — the file we just built has it (norm passed),
    # matching the real zoo layout.
    tmp_file = tmp_path / "tmp.th"
    torch.save(state, tmp_file)
    sha = hashlib.sha256(tmp_file.read_bytes()).hexdigest()[:8]
    ckpt = tmp_path / f"encodec_24khz-{sha}.th"
    tmp_file.rename(ckpt)

    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.torch_zoo import load_pretrained
    # Note: the available reference decoder is the fork's, whose final conv
    # is norm='none' (seanet.py:228); real upstream zoo files weight-norm it
    # (our factory default). Match the fixture here.
    model = build_model([1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000,
                        channels=1, causal=True, model_norm="weight_norm",
                        name="encodec_24khz", ratios=[8, 5, 4, 2], bins=1024,
                        dimension=128, decoder_final_norm="none")
    load_pretrained(model, ckpt.name, repository=str(tmp_path))

    model.set_target_bandwidth(6.0)
    wav = torch.randn(1, 1, 4800)
    with torch.no_grad():
        emb = enc(wav)
        codes_ref = quant.encode(emb, 75, 6.0).numpy()
        decoded_ref = dec(quant.decode(torch.tensor(codes_ref))).numpy()
    frames = model.encode(jnp.asarray(wav.numpy()))
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  codes_ref.transpose(1, 0, 2))
    out = model.decode(frames)
    np.testing.assert_allclose(np.asarray(out), decoded_ref,
                               rtol=1e-4, atol=1e-4)
    # corrupted checksum rejected
    bad = tmp_path / "encodec_24khz-deadbeef.th"
    bad.write_bytes(ckpt.read_bytes())
    with pytest.raises(RuntimeError):
        load_pretrained(model, bad.name, repository=str(tmp_path))


    # fork training checkpoint: dash-less filename (no embedded checksum)
    # with the weights wrapped in model_state_dict (ref train.py:504-522)
    fork = tmp_path / "model.pth"
    torch.save({"model_state_dict": state, "epoch": 7}, fork)
    model2 = build_model([1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000,
                         channels=1, causal=True, model_norm="weight_norm",
                         name="encodec_24khz", ratios=[8, 5, 4, 2], bins=1024,
                         dimension=128, decoder_final_norm="none")
    load_pretrained(model2, fork.name, repository=str(tmp_path))
    model2.set_target_bandwidth(6.0)
    frames2 = model2.encode(jnp.asarray(wav.numpy()))
    np.testing.assert_array_equal(np.asarray(frames2[0][0]),
                                  codes_ref.transpose(1, 0, 2))


@pytest.mark.slow
def test_export_reference_checkpoint_roundtrip(tmp_path):
    """Bidirectional interchange: a model exported with
    `save_reference_checkpoint` (a) reloads through `load_pretrained` with
    every parameter bit-identical, and (b) loads into the REFERENCE's own
    torch modules via plain `load_state_dict`, which then reproduce our
    codes exactly — so models trained here are directly usable by
    reference users."""
    import jax
    import jax.numpy as jnp
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.torch_zoo import (save_reference_checkpoint,
                                              load_pretrained)

    # decoder_final_norm="none": the available reference decoder is the
    # fork's, whose final conv drops weight norm (ref seanet.py:228) — the
    # torch-module load below must find a plain `weight` key there
    model = build_model([1.5, 3.0, 6.0], sample_rate=24_000, channels=1,
                        causal=True, model_norm="weight_norm",
                        name="encodec_24khz", ratios=[8, 5, 4, 2], bins=64,
                        dimension=32, n_filters=4, kmeans_init=False, seed=3,
                        decoder_final_norm="none")
    path = save_reference_checkpoint(model, str(tmp_path))

    # (a) bit-identical reload through our own loader
    model2 = build_model([1.5, 3.0, 6.0], sample_rate=24_000, channels=1,
                         causal=True, model_norm="weight_norm",
                         name="encodec_24khz", ratios=[8, 5, 4, 2], bins=64,
                         dimension=32, n_filters=4, kmeans_init=False, seed=4,
                         decoder_final_norm="none")
    import os
    load_pretrained(model2, os.path.basename(path), repository=str(tmp_path))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(model.params),
            jax.tree_util.tree_leaves_with_path(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))
    np.testing.assert_array_equal(np.asarray(model.qstate.embed),
                                  np.asarray(model2.qstate.embed))

    # (b) the reference's own modules accept the file and agree on codes
    enc = ref_seanet.SEANetEncoder(channels=1, dimension=32, n_filters=4,
                                   ratios=[8, 5, 4, 2], causal=True,
                                   norm="weight_norm")
    dec = ref_seanet.SEANetDecoder(channels=1, dimension=32, n_filters=4,
                                   ratios=[8, 5, 4, 2], causal=True,
                                   norm="weight_norm")
    quant = ref_vq.ResidualVectorQuantizer(dimension=32, n_q=8, bins=64,
                                           codebook_dim=32, kmeans_init=False)
    quant.vq.layers = torch.nn.ModuleList(
        [core_vq.VectorQuantization(dim=32, codebook_size=64,
                                    codebook_dim=32, kmeans_init=False)
         for _ in range(8)])
    state = torch.load(path, map_location="cpu", weights_only=True)
    for root, m in [("encoder.", enc), ("decoder.", dec),
                    ("quantizer.", quant)]:
        sub = {k[len(root):]: v for k, v in state.items()
               if k.startswith(root)}
        missing, unexpected = m.load_state_dict(sub, strict=False)
        assert not unexpected, (root, unexpected)
    for m in (enc, dec, quant):
        m.eval()

    model.set_target_bandwidth(6.0)
    wav = torch.randn(1, 1, 2400)
    with torch.no_grad():
        codes_ref = quant.encode(enc(wav), 75, 6.0).numpy()
    frames = model.encode(jnp.asarray(wav.numpy()))
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  codes_ref.transpose(1, 0, 2))


@pytest.mark.slow
def test_trained_weight_margin_audit_runs():
    """audit_trained end-to-end on a short schedule: real EMA training,
    export into the reference's modules, exact-code comparison on trained
    weights — the near-tie regime random-weight audits cannot exhibit
    (SURVEY §7.4). Codes must match the reference bit-for-bit and the
    report must quantify the (much tighter) trained margins."""
    from tests.margin_audit import audit_trained
    r = audit_trained(steps=40, val_batches=1)
    assert r["train_loss_last"] < r["train_loss_first"]
    assert r["total_code_mismatches"] == 0
    assert r["bandwidth_code_match"]["0.08"]["codes"] > 0
    # half-converged codebooks legitimately contain near-duplicate entries
    # (margin ~ 0 between duplicates), so the safety factor can dip below
    # 1 on a short schedule without any actual flip — it is reported, not
    # asserted; code equality above is the behavioral check
    assert r["safety_factor"] > 0.0 and np.isfinite(r["safety_factor"])
    assert len(r["stages"]) == r["n_q"]


@pytest.mark.slow
def test_export_roundtrip_time_group_norm_48k_layout(tmp_path):
    """Export/reload also holds for the 48 kHz-style layout: non-causal,
    stereo, time_group_norm (module-norm params ride in `norm.{weight,
    bias}` keys rather than weight-norm reparameterization)."""
    import os
    import jax
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.torch_zoo import (save_reference_checkpoint,
                                              load_pretrained)
    kw = dict(sample_rate=48_000, channels=2, causal=False,
              model_norm="time_group_norm", name="encodec_48khz",
              ratios=[8, 5, 4, 2], bins=64, dimension=32, n_filters=4,
              audio_normalize=True, segment=1.0, kmeans_init=False)
    model = build_model([3.0, 6.0], seed=11, **kw)
    path = save_reference_checkpoint(model, str(tmp_path))
    model2 = build_model([3.0, 6.0], seed=12, **kw)
    load_pretrained(model2, os.path.basename(path), repository=str(tmp_path))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(model.params),
            jax.tree_util.tree_leaves_with_path(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))
    np.testing.assert_array_equal(np.asarray(model.qstate.embed),
                                  np.asarray(model2.qstate.embed))
