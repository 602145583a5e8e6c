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


def test_streaming_encoder_matches_python_and_batch():
    """Per-symbol native encode == Python ArithmeticCoder == native batch."""
    _, cdfs, symbols = _random_problem(seed=5)
    enc = native.StreamingEncoder()
    for s, cdf in zip(symbols, cdfs):
        enc.push(int(s), cdf)
    stream_native = enc.finish()
    enc.close()

    fo = io.BytesIO()
    coder = ArithmeticCoder(fo)
    for s, cdf in zip(symbols, cdfs):
        coder.push(int(s), torch.tensor(cdf))
    coder.flush()
    assert stream_native == fo.getvalue()
    assert stream_native == native.encode_batch(symbols, cdfs)
    # and it decodes
    out = native.decode_batch(stream_native, cdfs)
    np.testing.assert_array_equal(out, symbols)


def test_streaming_encoder_finish_is_idempotent():
    """finish() may be retried (internal buffer growth) without
    corrupting the stream."""
    _, cdfs, symbols = _random_problem(card=50, steps=40, seed=6)
    enc = native.StreamingEncoder()
    for s, cdf in zip(symbols, cdfs):
        enc.push(int(s), cdf)
    a = enc.finish()
    b = enc.finish()
    assert a == b
    np.testing.assert_array_equal(native.decode_batch(a, cdfs), symbols)


def test_native_decode_corrupt_raises_runtime_not_eof():
    """A corrupted (not truncated) payload reports corruption the same way
    the Python decoder does (RuntimeError), not EOFError."""
    _, cdfs, symbols = _random_problem(card=64, steps=200, seed=7)
    stream = bytearray(native.encode_batch(symbols, cdfs))
    rng = random.Random(0)
    native_err = python_err = None
    for trial in range(64):  # find a flip that corrupts (not just perturbs)
        corrupted = bytearray(stream)
        corrupted[rng.randrange(len(stream))] ^= 0xFF
        data = bytes(corrupted)
        try:
            out = native.decode_batch(data, cdfs)
            continue  # this flip decoded to other symbols — not corrupt
        except EOFError:
            continue  # clean truncation-style end — acceptable either way
        except RuntimeError as e:
            native_err = e
        # the Python decoder must classify the same payload the same way
        dec = ArithmeticDecoder(io.BytesIO(data))
        try:
            for cdf in cdfs:
                if dec.pull(torch.tensor(cdf)) is None:
                    break
        except RuntimeError as e:
            python_err = e
        break
    if native_err is not None:
        assert "Binary search failed" in str(native_err)
        assert python_err is None or "Binary search failed" in str(python_err)
