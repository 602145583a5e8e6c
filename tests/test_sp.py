"""Sequence-parallel encoder: bit-exact equivalence with the unsharded
forward on the virtual 8-device mesh."""

import numpy as np
import pytest
# exhaustive parallel/e2e verification tier — run via 'make tests'
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from encodec_tpu.models.model import build_model
from encodec_tpu.models.seanet import seanet_encoder
from encodec_tpu.parallel import make_mesh
from encodec_tpu.parallel.sp import seanet_encode_sp, encode_sp


@pytest.fixture(scope="module")
def model():
    return build_model([0.08], sample_rate=10, channels=1, causal=True,
                       model_norm="layer_norm", name="breathing_model",
                       ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                       decoder_final_norm="none", shared_codebook=True,
                       kmeans_init=False, seed=0)


def test_seq_parallel_encoder_exact(model):
    mesh = make_mesh(8, axis_name="seq")
    cfg = model.cfg.seanet
    hop = cfg.hop_length
    T = hop * 8 * 16  # divisible by n_shards * hop
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, 1))
    ref = seanet_encoder(model.params["encoder"], x, cfg)
    got = seanet_encode_sp(model.params["encoder"], x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_seq_parallel_codes_exact(model):
    mesh = make_mesh(8, axis_name="seq")
    hop = model.cfg.seanet.hop_length
    x = jax.random.normal(jax.random.PRNGKey(1), (1, hop * 8 * 8, 1))
    from encodec_tpu.quant import rvq_encode
    from encodec_tpu.models.seanet import seanet_encoder as enc
    emb = enc(model.params["encoder"], x, model.cfg.seanet)
    ref_codes = jnp.transpose(
        rvq_encode(model.qstate, emb, model.cfg.rvq), (1, 0, 2))
    got = encode_sp(model.params, model.qstate, x, model.cfg, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_codes))


def test_seq_parallel_24k_style_weight_norm():
    mesh = make_mesh(4, axis_name="seq")
    m = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                    model_norm="weight_norm", name="encodec_24khz",
                    ratios=[4, 3, 2, 1], bins=64, dimension=16, n_filters=4,
                    kmeans_init=False, seed=2)
    cfg = m.cfg.seanet
    x = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.hop_length * 4 * 10, 1))
    ref = seanet_encoder(m.params["encoder"], x, cfg)
    got = seanet_encode_sp(m.params["encoder"], x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_seq_parallel_decoder_exact(model):
    from encodec_tpu.models.seanet import seanet_decoder
    from encodec_tpu.parallel.sp import seanet_decode_sp
    mesh = make_mesh(8, axis_name="seq")
    cfg = model.cfg.seanet
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 8 * 5, cfg.dimension))
    ref = seanet_decoder(model.params["decoder"], z, cfg)
    got = seanet_decode_sp(model.params["decoder"], z, cfg, mesh)
    # shard-boundary overlap-add splits the conv accumulation -> float eps;
    # the boundary ulps then propagate through the (shift-lowered, see
    # ops.conv1d lowering="auto") resblocks with slightly different
    # rounding than the MXU form, so allow a few e-4 relative on tiny
    # elements (observed worst: 2.0e-4 rel / 5.4e-5 abs on 1 of 800)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=1e-4)


def test_seq_parallel_full_codec_roundtrip(model):
    """encode_sp -> decode_sp == offline encode -> decode, exactly."""
    from encodec_tpu.parallel.sp import decode_sp
    from encodec_tpu.models.seanet import seanet_decoder
    from encodec_tpu.quant import rvq_decode
    mesh = make_mesh(8, axis_name="seq")
    hop = model.cfg.seanet.hop_length
    x = jax.random.normal(jax.random.PRNGKey(5), (1, hop * 8 * 4, 1))
    codes = encode_sp(model.params, model.qstate, x, model.cfg, mesh)
    audio = decode_sp(model.params, model.qstate, codes, model.cfg, mesh)
    # offline oracle
    emb = rvq_decode(model.qstate,
                     jnp.transpose(codes, (1, 0, 2)), model.cfg.rvq)
    ref = seanet_decoder(model.params["decoder"], emb, model.cfg.seanet)
    np.testing.assert_allclose(np.asarray(audio), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_seq_parallel_decoder_24k_weight_norm():
    from encodec_tpu.models.seanet import seanet_decoder
    from encodec_tpu.parallel.sp import seanet_decode_sp
    mesh = make_mesh(4, axis_name="seq")
    m = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                    model_norm="weight_norm", name="encodec_24khz",
                    ratios=[4, 3, 2, 1], bins=64, dimension=16, n_filters=4,
                    kmeans_init=False, seed=6)
    cfg = m.cfg.seanet
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 4 * 6, cfg.dimension))
    ref = seanet_decoder(m.params["decoder"], z, cfg)
    got = seanet_decode_sp(m.params["decoder"], z, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_final_activation_torch_names(model):
    """The SP decoder resolves the same activation names as the offline
    decoder (torch class names like 'ELU' included)."""
    from encodec_tpu.models.seanet import resolve_activation
    import jax
    for name in ("tanh", "Tanh", "elu", "ELU"):
        fn = resolve_activation(name)
        assert fn is not None and callable(fn)
    assert resolve_activation("Tanh")(jnp.asarray(0.5)) == jnp.tanh(0.5)


def test_sp_short_shard_raises_actionable_error():
    """A per-shard length below a layer's receptive context (long dilations,
    many shards, short signal) must raise a clear ValueError, not an opaque
    shape mismatch."""
    import jax
    import pytest
    from encodec_tpu.models.seanet import SEANetConfig, init_seanet_encoder
    from encodec_tpu.parallel.sp import seanet_encode_sp
    cfg = SEANetConfig(channels=1, dimension=16, n_filters=4, causal=True,
                       ratios=(2, 5), n_residual_layers=3, dilation_base=4,
                       norm="layer_norm")
    params = init_seanet_encoder(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(8, axis_name="seq")
    # per-shard trunk length after the first downsample is 2 < the
    # dilation-16 resblock context of 32
    x = jnp.zeros((1, cfg.hop_length * 8, 1))
    with pytest.raises(ValueError, match="shard too short"):
        seanet_encode_sp(params, x, cfg, mesh)
