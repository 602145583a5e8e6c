"""Config-space fuzz: random model configurations must roundtrip.

The targeted parity suites pin the two published architectures plus the
breathing fork; this sweep walks a seeded random corner of the config
space (ratios/bins/filters/norms/causality/channels/segmentation) and
asserts the invariants every configuration must satisfy:

* encode → decode returns the right shape and finite audio,
* compress → decompress reproduces the exact code indices (the `.ecdc`
  body is lossless whatever the architecture),
* a second encode of the same signal is deterministic.
"""

import io


import pytest  # noqa: F811

# exhaustive parallel/e2e verification tier — run via 'make tests'
pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np
import pytest

from encodec_tpu.models.model import build_model
from encodec_tpu.stream.compress import compress_to_file, decompress_from_file

def _case_seed(case) -> int:
    """Deterministic per-case seed. Python's hash() is salted per process
    (PYTHONHASHSEED), which silently made every run fuzz a different
    corpus — failures were unreproducible by construction."""
    import zlib
    return zlib.crc32(repr(case).encode()) % (2 ** 31)


CASES = [
    # (ratios, bins, dim, n_filters, causal, norm, channels, segment, normalize)
    ((4, 3, 2), 64, 24, 6, True, "weight_norm", 1, None, False),
    ((6, 5, 5, 2, 1), 128, 32, 4, True, "layer_norm", 1, None, False),
    # bins must be a power of two for the bitstream (bits_per_codebook)
    ((2, 2), 16, 8, 3, False, "time_group_norm", 2, 1.0, True),
    ((7,), 256, 16, 5, False, "none", 1, None, False),
    ((5, 4), 32, 20, 4, True, "layer_norm", 2, None, False),
    ((3, 2, 2), 512, 16, 2, False, "weight_norm", 1, 0.5, True),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"r{'x'.join(map(str, c[0]))}_b{c[1]}_"
                              f"{'c' if c[4] else 'nc'}_{c[5]}_ch{c[6]}"
                              for c in CASES])
def test_random_config_roundtrips(case):
    ratios, bins, dim, n_filters, causal, norm, channels, segment, normalize \
        = case
    sr = int(np.prod(ratios)) * 25  # 25 Hz frame rate keeps shapes small
    bw_per_q = (np.log2(bins) * 25) / 1000.0
    model = build_model(
        [round(8 * bw_per_q, 4)], sample_rate=sr, channels=channels,
        causal=causal, model_norm=norm, audio_normalize=normalize,
        segment=segment, ratios=ratios, bins=bins, dimension=dim,
        n_filters=n_filters, name="fuzz_model", seed=_case_seed(case))
    model.set_target_bandwidth(model.cfg.target_bandwidths[0])

    rng = np.random.RandomState(_case_seed(case) ^ 0x5EED)
    T = int(1.7 * sr)  # non-multiple of hop and of the segment stride
    x = rng.randn(2, channels, T).astype(np.float32)

    frames = model.encode(jnp.asarray(x))
    assert all(f[0].shape[0] == 2 for f in frames)
    # bandwidth → K follows the reference's two formulas (the 10-bit
    # model-capacity rule + the true-bits active rule, silently capped);
    # structurally every frame must agree and stay within capacity
    K = frames[0][0].shape[1]
    assert 1 <= K <= model.cfg.rvq.n_q
    assert all(f[0].shape[1] == K for f in frames)
    out = np.asarray(model.decode(frames))
    assert out.shape[0] == 2 and out.shape[1] == channels
    assert out.shape[2] >= T
    assert np.isfinite(out).all()

    # determinism
    frames2 = model.encode(jnp.asarray(x))
    for (c1, _), (c2, _) in zip(frames, frames2):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # .ecdc body is lossless for any architecture
    buf = io.BytesIO()
    registry = {"fuzz_model": lambda pretrained=True, **kw: model}
    compress_to_file(model, x[0], buf, models=registry)
    buf.seek(0)
    wav, sr_out = decompress_from_file(buf, models=registry)
    assert sr_out == sr
    assert wav.shape == (channels, T)
    buf.seek(0)
    from encodec_tpu.stream import binary
    meta = binary.read_ecdc_header(buf)
    assert meta["m"] == "fuzz_model"
    assert meta["al"] == T
    # the stream carried the exact codes+scales: decoding them here must
    # reproduce the decompressor's audio bit-for-bit
    direct = np.asarray(model.decode(model.encode(jnp.asarray(x[:1]))))
    np.testing.assert_array_equal(np.asarray(wav), direct[0, :, :T])


@pytest.mark.parametrize("case", [c for c in CASES if c[4]],
                         ids=[f"r{'x'.join(map(str, c[0]))}_b{c[1]}_{c[5]}_"
                              f"ch{c[6]}" for c in CASES if c[4]])
def test_random_config_streaming_matches_offline(case):
    """Every causal configuration must stream exactly: chunked encode
    (uneven hop-multiple chunks + a ragged finish tail) produces the same
    codes as the offline encoder, and chunked decode reconstructs the
    offline audio to float tolerance — across norms, channel counts,
    ratio ladders and dilation stacks, not just the two pinned models."""
    from encodec_tpu.models.streaming import StreamingCodec, min_first_chunk
    ratios, bins, dim, n_filters, causal, norm, channels, segment, normalize \
        = case
    sr = int(np.prod(ratios)) * 25
    bw_per_q = (np.log2(bins) * 25) / 1000.0
    model = build_model(
        [round(8 * bw_per_q, 4)], sample_rate=sr, channels=channels,
        causal=causal, model_norm=norm, ratios=ratios, bins=bins,
        dimension=dim, n_filters=n_filters, name="fuzz_model",
        seed=_case_seed(case))
    model.set_target_bandwidth(model.cfg.target_bandwidths[0])
    hop = model.cfg.seanet.hop_length
    first = max(min_first_chunk(model.cfg.seanet) // hop, 3)

    rng = np.random.RandomState(_case_seed(case) ^ 0xF00D)
    n_hops = first + 11
    tail = int(rng.randint(1, hop)) if hop > 1 else 0
    T = n_hops * hop + tail
    x = rng.randn(1, channels, T).astype(np.float32)

    frames = model.encode(jnp.asarray(x))
    offline_codes = np.asarray(frames[0][0])
    offline_audio = np.asarray(model.decode(frames))

    codec = StreamingCodec(model)
    cuts = [0, first * hop, (first + 4) * hop, n_hops * hop]
    parts = [codec.encode_chunk(x[:, :, a:b])
             for a, b in zip(cuts[:-1], cuts[1:])]
    if tail:
        parts.append(codec.encode_finish(x[:, :, n_hops * hop:]))
    streamed = np.concatenate([np.asarray(p) for p in parts], axis=-1)
    np.testing.assert_array_equal(streamed, offline_codes)

    audio = np.concatenate(
        [np.asarray(codec.decode_chunk(jnp.asarray(p))) for p in parts],
        axis=-1)
    np.testing.assert_allclose(audio, offline_audio[:, :, :audio.shape[-1]],
                               rtol=1e-4, atol=1e-5)
