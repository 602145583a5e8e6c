"""Streaming (chunked) codec: exact equivalence with the batch forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from encodec_tpu.models.model import build_model
from encodec_tpu.models.seanet import seanet_encoder, seanet_decoder
from encodec_tpu.models.streaming import (encoder_stream_step,
                                          decoder_stream_step,
                                          StreamingCodec)


@pytest.fixture(scope="module")
def causal_model():
    # 24 kHz-style causal weight_norm model, tiny widths
    return build_model([1.5, 3.0], sample_rate=24000, channels=1, causal=True,
                       model_norm="weight_norm", name="encodec_24khz",
                       ratios=[4, 3, 2, 1], bins=64, dimension=16,
                       n_filters=4, kmeans_init=False, seed=0)


def test_streaming_encoder_matches_batch(causal_model):
    model = causal_model
    cfg = model.cfg.seanet
    hop = cfg.hop_length
    T = hop * 30
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, 1))
    batch_out = seanet_encoder(model.params["encoder"], x, cfg)

    chunks = [x[:, :hop * 12], x[:, hop * 12:hop * 21], x[:, hop * 21:]]
    outs, state = [], None
    for c in chunks:
        y, state = encoder_stream_step(model.params["encoder"], c, state, cfg)
        outs.append(y)
    stream_out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream_out), np.asarray(batch_out),
                               rtol=1e-5, atol=1e-5)


def test_streaming_decoder_matches_batch(causal_model):
    model = causal_model
    cfg = model.cfg.seanet
    Tz = 24
    z = jax.random.normal(jax.random.PRNGKey(1), (2, Tz, cfg.dimension))
    batch_out = seanet_decoder(model.params["decoder"], z, cfg)

    outs, state = [], None
    for sl in [slice(0, 10), slice(10, 17), slice(17, 24)]:
        y, state = decoder_stream_step(model.params["decoder"], z[:, sl],
                                       state, cfg)
        outs.append(y)
    stream_out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream_out), np.asarray(batch_out),
                               rtol=1e-4, atol=1e-5)


def test_streaming_codec_roundtrip_matches_offline(causal_model):
    """Full chunked encode→decode equals the offline encode→decode."""
    model = causal_model
    model.set_target_bandwidth(1.5)
    hop = model.cfg.seanet.hop_length
    T = hop * 24
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, T))

    frames = model.encode(x)
    offline_codes = np.asarray(frames[0][0])
    offline_audio = np.asarray(model.decode(frames))

    codec = StreamingCodec(model)
    all_codes, all_audio = [], []
    for sl in [slice(0, hop * 10), slice(hop * 10, hop * 18),
               slice(hop * 18, T)]:
        codes = codec.encode_chunk(x[:, :, sl])
        all_codes.append(np.asarray(codes))
        all_audio.append(np.asarray(codec.decode_chunk(codes)))
    stream_codes = np.concatenate(all_codes, axis=-1)
    stream_audio = np.concatenate(all_audio, axis=-1)

    np.testing.assert_array_equal(stream_codes, offline_codes)
    np.testing.assert_allclose(stream_audio, offline_audio,
                               rtol=1e-4, atol=1e-5)


def test_streaming_breathing_model_layer_norm():
    """Streaming also holds for the fork's layer_norm breathing config."""
    model = build_model([0.08], sample_rate=10, channels=1, causal=True,
                        model_norm="layer_norm", name="breathing_model",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", shared_codebook=True,
                        kmeans_init=False, seed=1)
    cfg = model.cfg.seanet
    hop = cfg.hop_length
    x = jax.random.normal(jax.random.PRNGKey(3), (1, hop * 50, 1))
    batch_out = seanet_encoder(model.params["encoder"], x, cfg)
    outs, state = [], None
    for sl in [slice(0, hop * 25), slice(hop * 25, hop * 50)]:
        y, state = encoder_stream_step(model.params["encoder"], x[:, sl],
                                       state, cfg)
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(batch_out), rtol=1e-4, atol=1e-5)


def test_stream_extractor_matches_offline(causal_model):
    """tools.inference._StreamExtractor: one fixed-chunk executable for
    any night length — exact vs extract_codes for hop-multiple lengths,
    and exact on all but the final partial frame otherwise."""
    import numpy as np
    from encodec_tpu.tools.inference import extract_codes, _StreamExtractor
    model = causal_model
    hop = model.cfg.seanet.hop_length
    ex = _StreamExtractor(model, chunk_hops=16)

    rng = np.random.RandomState(0)
    # hop-multiple lengths (incl. a non-chunk-multiple): exact
    for T in (hop * 16, hop * 37):
        x = rng.randn(1, T).astype(np.float32)
        np.testing.assert_array_equal(ex(x), extract_codes(model, x))
    # ragged length: every fully-covered frame exact; only the final
    # partial frame may differ (zero vs reflect tail padding)
    T = hop * 21 + 7
    x = rng.randn(1, T).astype(np.float32)
    a, b = ex(x), extract_codes(model, x)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a[:, :-1], b[:, :-1])


def test_min_first_chunk_bound_is_sufficient(causal_model):
    """A first chunk of exactly min_first_chunk samples primes every layer
    so streamed codes equal batch codes; the bound is a hop multiple."""
    import numpy as np
    from encodec_tpu.models.streaming import StreamingCodec, min_first_chunk
    from encodec_tpu.tools.inference import extract_codes
    model = causal_model
    hop = model.cfg.seanet.hop_length
    L = min_first_chunk(model.cfg.seanet)
    assert L % hop == 0 and L >= hop
    T = L + hop * 8
    x = np.random.RandomState(3).randn(1, T).astype(np.float32)

    codec = StreamingCodec(model)
    first = jnp.asarray(x[None, :, :L])          # [B, C, L]
    rest = jnp.asarray(x[None, :, L:])
    c0 = codec.encode_chunk(first)
    c1 = codec.encode_chunk(rest)
    streamed = np.concatenate([np.asarray(c0), np.asarray(c1)], axis=-1)[0]
    np.testing.assert_array_equal(streamed, extract_codes(model, x))


def test_stream_extractor_guards(causal_model):
    import pytest
    from encodec_tpu.tools.inference import _StreamExtractor
    from encodec_tpu.models.model import build_model
    # chunk below the priming bound is rejected, not silently wrong
    with pytest.raises(ValueError, match="min_first_chunk"):
        _StreamExtractor(causal_model, chunk_hops=1)
    # normalize/segmented models must use the offline path
    norm_model = build_model([1.5], sample_rate=24000, channels=1,
                             causal=True, model_norm="weight_norm",
                             name="encodec_24khz", ratios=[4, 3, 2, 1],
                             bins=64, dimension=16, n_filters=4,
                             audio_normalize=True, kmeans_init=False)
    with pytest.raises(ValueError, match="normalize"):
        _StreamExtractor(norm_model, chunk_hops=64)


def test_encoder_stream_finish_exact_tail(causal_model):
    """Chunked encode + `encode_finish` on a NON-hop-multiple signal equals
    the offline encode bit-for-bit, including the final partial frame the
    batch path right-pads (round-2 leftover: the old extractor zero-padded
    the tail and the last frame could differ)."""
    model = causal_model
    model.set_target_bandwidth(1.5)
    hop = model.cfg.seanet.hop_length
    for r in [1, 7, hop // 2, hop - 1]:
        T = hop * 20 + r
        x = jax.random.normal(jax.random.PRNGKey(40 + r), (1, 1, T))
        frames = model.encode(x)
        offline_codes = np.asarray(frames[0][0])
        assert offline_codes.shape[-1] == 21  # ceil semantics

        codec = StreamingCodec(model)
        c1 = np.asarray(codec.encode_chunk(x[:, :, :hop * 12]))
        c2 = np.asarray(codec.encode_chunk(x[:, :, hop * 12:hop * 20]))
        c3 = np.asarray(codec.encode_finish(x[:, :, hop * 20:]))
        stream_codes = np.concatenate([c1, c2, c3], axis=-1)
        np.testing.assert_array_equal(stream_codes, offline_codes, err_msg=f"r={r}")
        assert codec._enc_state is None  # stream finished


def test_encoder_stream_finish_guards(causal_model):
    model = causal_model
    codec = StreamingCodec(model)
    hop = model.cfg.seanet.hop_length
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, hop * 12))
    with pytest.raises(AssertionError):
        codec.encode_finish(x[:, :, :5])   # no prior chunk
    codec.encode_chunk(x)
    with pytest.raises(AssertionError):
        codec.encode_finish(x)             # full-hop tail not allowed


def test_stream_extractor_exact_for_any_length(causal_model):
    """The dataset extractor is now bit-exact with offline extraction for
    arbitrary (non-hop-multiple) lengths via the binary remainder ladder +
    stream finish."""
    from encodec_tpu.tools.inference import extract_codes, _StreamExtractor
    model = causal_model
    model.set_target_bandwidth(1.5)
    hop = model.cfg.seanet.hop_length
    ex = _StreamExtractor(model, chunk_hops=8)
    rng = np.random.RandomState(3)
    for T in [hop * 8, hop * 8 + 1, hop * 13 + 7, hop * 21 + hop - 1,
              hop * 9 + hop // 3]:
        x = rng.randn(1, T).astype(np.float32)
        np.testing.assert_array_equal(ex(x), extract_codes(model, x),
                                      err_msg=f"T={T}")

def test_stream_extractor_non_power_of_two_chunk(causal_model):
    """Remainder ladder regression: with a non-power-of-two chunk_hops the
    old ladder (seeded at chunk_hops//2, halving only) could not represent
    every remainder and silently dropped trailing full-hop frames (e.g.
    chunk_hops=12 stranded m ∈ {2,5,8,11}). The ladder now decomposes the
    remainder by its own binary representation."""
    from encodec_tpu.tools.inference import extract_codes, _StreamExtractor
    model = causal_model
    model.set_target_bandwidth(1.5)
    hop = model.cfg.seanet.hop_length
    ex = _StreamExtractor(model, chunk_hops=12)
    rng = np.random.RandomState(7)
    for m in [2, 5, 8, 11]:            # previously-stranded remainders
        T = hop * (12 + m) + 3         # + a partial tail frame on top
        x = rng.randn(1, T).astype(np.float32)
        np.testing.assert_array_equal(ex(x), extract_codes(model, x),
                                      err_msg=f"m={m}")


def test_stream_step_honors_lowering(causal_model):
    """Lowering plumbing: the streaming encoder/decoder steps route their
    small-channel convs through the VPU shift form when asked (the batch
    paths already do — a mismatch silently breaks streamed==batch
    equivalence at set_precision('high'/'fast') and for decode always)."""
    cfg = causal_model.cfg.seanet
    p_enc = causal_model.params["encoder"]
    p_dec = causal_model.params["decoder"]
    x = jnp.zeros((1, cfg.hop_length * 8, 1))
    z = jnp.zeros((1, 8, cfg.dimension))

    def n_convs(fn, *args):
        return jax.jit(fn).lower(*args).as_text().count("convolution")

    enc_mxu = n_convs(lambda p, x: encoder_stream_step(
        p, x, None, cfg, lowering="mxu")[0], p_enc, x)
    enc_auto = n_convs(lambda p, x: encoder_stream_step(
        p, x, None, cfg, lowering="auto")[0], p_enc, x)
    assert enc_auto < enc_mxu, (enc_auto, enc_mxu)

    dec_mxu = n_convs(lambda p, z: decoder_stream_step(
        p, z, None, cfg, lowering="mxu")[0], p_dec, z)
    dec_auto = n_convs(lambda p, z: decoder_stream_step(
        p, z, None, cfg)[0], p_dec, z)  # default must be "auto" (batch parity)
    assert dec_auto < dec_mxu, (dec_auto, dec_mxu)


def test_streaming_codec_follows_set_precision_lowering(causal_model):
    """StreamingCodec must mirror the model's encode lowering: at
    set_precision('high') the batch encoder takes the VPU shift form, and
    streamed codes must equal batch codes through the same form."""
    model = causal_model
    model.set_target_bandwidth(1.5)
    hop = model.cfg.seanet.hop_length
    T = hop * 24
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 1, T))
    try:
        model.set_precision("high")
        assert model._encode_lowering == "auto"
        frames = model.encode(x)
        offline_codes = np.asarray(frames[0][0])
        codec = StreamingCodec(model)
        assert codec._lowering == "auto"
        c1 = codec.encode_chunk(x[:, :, :hop * 12])
        c2 = codec.encode_chunk(x[:, :, hop * 12:])
        streamed = np.concatenate([np.asarray(c1), np.asarray(c2)], axis=-1)
        np.testing.assert_array_equal(streamed, offline_codes)
    finally:
        model.set_precision("highest")


def test_decoder_small_model_single_chunk_bitexact():
    """Init-conv lowering regression: on decoders small enough that the
    init conv fits the shift threshold, batch and streaming decode must
    pick the SAME lowering — a single whole-input chunk is then bitwise
    equal to the batch decoder (no chunk boundary, no overlap-add
    reordering). Before the fix the batch path kept the MXU form on its
    init conv only, diverging by ~1e-5."""
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.seanet import seanet_decoder
    from encodec_tpu.models.streaming import decoder_stream_step
    m = build_model([1.0], sample_rate=500, channels=1, causal=True,
                    model_norm="weight_norm", name="small", ratios=[5, 4],
                    bins=32, dimension=20, n_filters=4, kmeans_init=False,
                    seed=0)
    cfg = m.cfg.seanet
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.dimension))
    batch = np.asarray(seanet_decoder(m.params["decoder"], z, cfg))
    one, _ = decoder_stream_step(m.params["decoder"], z, None, cfg)
    np.testing.assert_array_equal(np.asarray(one), batch)


def test_decoder_first_chunk_priming_guard(causal_model):
    """A first latent chunk below min_first_latent_chunk cannot prime the
    decoder's reflect contexts exactly; it must raise, not silently
    diverge (observed 1.5e-2 max abs before the guard)."""
    from encodec_tpu.models.streaming import (decoder_stream_step,
                                              min_first_latent_chunk)
    cfg = causal_model.cfg.seanet
    need = min_first_latent_chunk(cfg)
    assert need >= cfg.kernel_size  # init conv dominates here
    z = jax.random.normal(jax.random.PRNGKey(2), (1, need - 1, cfg.dimension))
    with pytest.raises(ValueError, match="min_first_latent_chunk"):
        decoder_stream_step(causal_model.params["decoder"], z, None, cfg)
    # exactly `need` is accepted
    z2 = jax.random.normal(jax.random.PRNGKey(3), (1, need, cfg.dimension))
    decoder_stream_step(causal_model.params["decoder"], z2, None, cfg)
