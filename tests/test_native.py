"""Native C++ arithmetic coder: bit-exactness vs the Python coder."""

import io
import random

import numpy as np
import pytest
import torch

from encodec_tpu import native
from encodec_tpu.stream import (ArithmeticCoder, ArithmeticDecoder,
                                build_stable_quantized_cdf)
from encodec_tpu.stream.ac import build_stable_quantized_cdf_batch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


def _random_problem(card=200, steps=300, seed=0):
    torch.manual_seed(seed)
    pdfs = torch.softmax(torch.randn(steps, card) * 2, dim=1).numpy()
    cdfs = build_stable_quantized_cdf_batch(pdfs, 24)
    symbols = np.array([int(torch.multinomial(torch.tensor(p), 1))
                        for p in pdfs], np.int32)
    return pdfs, cdfs, symbols


def test_cdf_batch_matches_scalar():
    pdfs, cdfs, _ = _random_problem()
    for i in range(0, len(pdfs), 37):
        np.testing.assert_array_equal(
            cdfs[i], build_stable_quantized_cdf(pdfs[i], 24))


def test_native_encode_matches_python():
    pdfs, cdfs, symbols = _random_problem()
    data_native = native.encode_batch(symbols, cdfs)
    fo = io.BytesIO()
    coder = ArithmeticCoder(fo)
    for s, c in zip(symbols, cdfs):
        coder.push(int(s), c)
    coder.flush()
    assert data_native == fo.getvalue()


def test_native_decode_roundtrip_and_cross():
    pdfs, cdfs, symbols = _random_problem(seed=1)
    data = native.encode_batch(symbols, cdfs)
    # native batch decode
    out = native.decode_batch(data, cdfs)
    np.testing.assert_array_equal(out, symbols)
    # python decodes native bytes
    dec = ArithmeticDecoder(io.BytesIO(data))
    for s, c in zip(symbols, cdfs):
        assert dec.pull(c) == int(s)
    # native streaming decoder
    sd = native.StreamingDecoder(data)
    for s, c in zip(symbols, cdfs):
        assert sd.pull(c) == int(s)
    sd.close()


def test_native_decode_truncated_raises():
    pdfs, cdfs, symbols = _random_problem(seed=2)
    data = native.encode_batch(symbols, cdfs)
    with pytest.raises(EOFError):
        native.decode_batch(data[:len(data) // 4], cdfs)


def test_multisegment_lm_roundtrip():
    """48k-style segmented stream with LM entropy coding: per-frame AC
    streams must butt against each other byte-exactly."""
    import jax
    import jax.numpy as jnp
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    from encodec_tpu.stream import compress, decompress

    model = build_model([1.5, 3.0], sample_rate=4800, channels=2,
                        causal=False, model_norm="time_group_norm",
                        audio_normalize=True, segment=1.0,
                        name="encodec_48khz", ratios=[8, 5, 4, 2], bins=64,
                        dimension=16, n_filters=4, kmeans_init=False)
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=64, dim=16, num_layers=2,
                      past_context=12)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(0), lm_cfg))
    rng = np.random.RandomState(3)
    wav = rng.randn(2, 4800 * 2 + 500).astype(np.float32)
    registry = {model.name: (lambda pretrained=True, m=model: m)}
    data = compress(model, wav, use_lm=True, lm=lm, models=registry)
    out, sr = decompress(data, models=registry, lm=lm)
    assert out.shape == (2, wav.shape[1])
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :wav.shape[1]]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)
