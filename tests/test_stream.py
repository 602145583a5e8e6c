"""Bitstream tests: packing, header, arithmetic coder — incl. cross-parity
with the reference coder (files must interchange byte-for-byte)."""

import io
import random

import numpy as np
import torch

from encodec_tpu.stream import (BitPacker, BitUnpacker, pack_bits, unpack_bits,
                                write_ecdc_header, read_ecdc_header,
                                ArithmeticCoder, ArithmeticDecoder,
                                build_stable_quantized_cdf)
from tests import ref_loader

ref_binary = ref_loader.load("encodec.binary")
ref_ac = ref_loader.load("encodec.quantization.ac")


def test_bitpacker_roundtrip_and_ghost_values():
    rng = np.random.RandomState(1234)
    for _ in range(4):
        length = int(rng.randint(10, 2000))
        bits = int(rng.randint(1, 16))
        tokens = rng.randint(0, 2 ** bits, size=length).tolist()
        buf = io.BytesIO()
        packer = BitPacker(bits, buf)
        for t in tokens:
            packer.push(t)
        packer.flush()
        buf.seek(0)
        unpacker = BitUnpacker(bits, buf)
        rebuilt = []
        while (v := unpacker.pull()) is not None:
            rebuilt.append(v)
        assert len(tokens) <= len(rebuilt) <= len(tokens) + 8 // bits
        assert rebuilt[:len(tokens)] == tokens


def test_pack_bits_matches_streaming_and_reference():
    rng = np.random.RandomState(0)
    for bits in [1, 3, 8, 10, 13]:
        vals = rng.randint(0, 2 ** bits, size=777)
        fast = pack_bits(vals, bits)
        buf = io.BytesIO()
        ref_packer = ref_binary.BitPacker(bits, buf)
        for v in vals:
            ref_packer.push(int(v))
        ref_packer.flush()
        assert fast == buf.getvalue()
        got = unpack_bits(fast, bits, count=len(vals))
        np.testing.assert_array_equal(got, vals)


def test_ecdc_header_interchange():
    meta = {"m": "encodec_24khz", "al": 123, "nc": 8, "lm": False}
    ours = io.BytesIO()
    write_ecdc_header(ours, meta)
    theirs = io.BytesIO()
    ref_binary.write_ecdc_header(theirs, meta)
    assert ours.getvalue() == theirs.getvalue()
    ours.seek(0)
    assert ref_binary.read_ecdc_header(ours) == meta
    theirs.seek(0)
    assert read_ecdc_header(theirs) == meta


def test_cdf_parity_with_reference():
    torch.manual_seed(7)
    for _ in range(5):
        card = random.randrange(10, 2000)
        pdf = torch.softmax(torch.randn(card), dim=0)
        ref_cdf = ref_ac.build_stable_quantized_cdf(pdf, 24).numpy()
        cdf = build_stable_quantized_cdf(pdf.numpy(), 24)
        np.testing.assert_array_equal(cdf, ref_cdf)


def test_ac_roundtrip():
    torch.manual_seed(1234)
    random.seed(1234)
    for _ in range(3):
        card = random.randrange(4, 4000)
        steps = random.randrange(100, 300)
        fo = io.BytesIO()
        encoder = ArithmeticCoder(fo)
        pdfs, symbols = [], []
        for _ in range(steps):
            pdf = torch.softmax(torch.randn(card), dim=0).numpy()
            pdfs.append(pdf)
            q_cdf = build_stable_quantized_cdf(pdf, encoder.total_range_bits)
            symbol = int(np.searchsorted(np.cumsum(pdf), random.random()))
            symbol = min(symbol, card - 1)
            symbols.append(symbol)
            encoder.push(symbol, q_cdf)
        encoder.flush()
        fo.seek(0)
        decoder = ArithmeticDecoder(fo)
        for idx, (pdf, symbol) in enumerate(zip(pdfs, symbols)):
            q_cdf = build_stable_quantized_cdf(pdf, decoder.total_range_bits)
            assert decoder.pull(q_cdf) == symbol, idx
        assert decoder.pull(np.zeros(1)) is None


def test_ac_cross_parity_with_reference():
    """Our encoder's bytes == reference encoder's bytes, and streams decode
    across implementations."""
    torch.manual_seed(99)
    random.seed(99)
    card, steps = 100, 200
    pdfs = [torch.softmax(torch.randn(card) * 2, dim=0) for _ in range(steps)]
    symbols = [int(torch.multinomial(p, 1)) for p in pdfs]

    ours = io.BytesIO()
    enc = ArithmeticCoder(ours)
    for p, s in zip(pdfs, symbols):
        enc.push(s, build_stable_quantized_cdf(p.numpy(), enc.total_range_bits))
    enc.flush()

    theirs = io.BytesIO()
    ref_enc = ref_ac.ArithmeticCoder(theirs)
    for p, s in zip(pdfs, symbols):
        ref_enc.push(s, ref_ac.build_stable_quantized_cdf(p, ref_enc.total_range_bits))
    ref_enc.flush()

    assert ours.getvalue() == theirs.getvalue()

    # reference decodes our bytes
    ours.seek(0)
    ref_dec = ref_ac.ArithmeticDecoder(ours)
    for p, s in zip(pdfs, symbols):
        assert ref_dec.pull(ref_ac.build_stable_quantized_cdf(
            p, ref_dec.total_range_bits)) == s
    # we decode reference bytes
    theirs.seek(0)
    dec = ArithmeticDecoder(theirs)
    for p, s in zip(pdfs, symbols):
        assert dec.pull(build_stable_quantized_cdf(
            p.numpy(), dec.total_range_bits)) == s


def test_ac_edge_cases():
    """Degenerate pdfs: zero-mass symbols are still decodable (min_range
    floor), tiny cardinality, very peaked distributions."""
    # zero-probability symbol can be encoded and decoded
    pdf = np.array([0.0, 1.0, 0.0], np.float32)
    cdf = build_stable_quantized_cdf(pdf, 24)
    fo = io.BytesIO()
    enc = ArithmeticCoder(fo)
    for s in [0, 2, 1, 0, 2]:
        enc.push(s, cdf)
    enc.flush()
    fo.seek(0)
    dec = ArithmeticDecoder(fo)
    assert [dec.pull(cdf) for _ in range(5)] == [0, 2, 1, 0, 2]

    # cardinality 2, extremely peaked
    pdf = np.array([1e-9, 1.0 - 1e-9], np.float32)
    cdf = build_stable_quantized_cdf(pdf, 24)
    fo = io.BytesIO()
    enc = ArithmeticCoder(fo)
    seq = [1] * 500 + [0] + [1] * 500
    for s in seq:
        enc.push(s, cdf)
    enc.flush()
    # the peaked stream should be tiny (far below 1 bit/symbol)
    assert len(fo.getvalue()) < 40
    fo.seek(0)
    dec = ArithmeticDecoder(fo)
    assert [dec.pull(cdf) for _ in range(len(seq))] == seq


def test_cdf_min_range_validation():
    import pytest
    pdf = np.full(4, 0.25, np.float32)
    with pytest.raises(ValueError):
        build_stable_quantized_cdf(pdf, 24, min_range=1)
    with pytest.raises(AssertionError):
        # min_range * cardinality must fit the total range
        build_stable_quantized_cdf(np.full(2 ** 24, 1.0, np.float32), 24,
                                   min_range=2)


def test_device_cdf_valid_and_bounds_consistent():
    """The device CDF builder must produce valid coder CDFs (monotone with
    >= min_range gaps, total <= 2^24) for adversarial float32 softmax rows
    — including rows whose f32 sum exceeds 1, which would overflow a
    margin-less builder — and `symbol_bounds` must equal gathering from
    `quantized_cdf_rows` (encode and decode sides of the device codec)."""
    import jax
    import jax.numpy as jnp
    from encodec_tpu.stream.device_cdf import quantized_cdf_rows, symbol_bounds

    rng = np.random.RandomState(0)
    total = 2 ** 24
    for card in (7, 64, 1024):
        logits = rng.randn(64, card).astype(np.float32) * 6
        pdfs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
                ).astype(np.float32)
        # adversarial: peaked rows (one symbol ~ 1.0) and exact one-hot rows
        pdfs[0, :] = 0; pdfs[0, 0] = 1.0
        pdfs[1, :] = np.float32(1e-12); pdfs[1, -1] = np.float32(1.0)
        rows, bad = jax.jit(quantized_cdf_rows)(jnp.asarray(pdfs))
        assert not bool(np.asarray(bad))
        rows = np.asarray(rows, np.int64)
        gaps = np.diff(np.concatenate(
            [np.zeros((len(rows), 1), np.int64), rows], axis=1), axis=1)
        assert (gaps >= 2).all()
        assert (rows[:, -1] <= total).all()

        symbols = rng.randint(0, card, size=(64,)).astype(np.int32)
        lows, highs, bad = jax.jit(symbol_bounds)(
            jnp.asarray(pdfs), jnp.asarray(symbols))
        assert not bool(np.asarray(bad))
        idx = np.arange(64)
        exp_low = np.where(symbols == 0, 0,
                           rows[idx, np.maximum(symbols - 1, 0)])
        exp_high = rows[idx, symbols] - 1
        np.testing.assert_array_equal(np.asarray(lows, np.int64), exp_low)
        np.testing.assert_array_equal(np.asarray(highs, np.int64), exp_high)


def test_device_cdf_degenerate_pdf_flags_bad():
    """A degenerate pdf (mass > 1 → CDF overflow) must set the validity
    flag, mirroring the host builder's ValueError (VERDICT r1 #7)."""
    import jax.numpy as jnp
    from encodec_tpu.stream.device_cdf import quantized_cdf_rows
    bad_pdf = jnp.full((1, 16), 0.5, jnp.float32)   # sums to 8 » 1
    _, bad = quantized_cdf_rows(bad_pdf)
    assert bool(np.asarray(bad))
    neg_pdf = jnp.full((1, 16), -1.0, jnp.float32)  # ranges < min_range
    _, bad = quantized_cdf_rows(neg_pdf)
    assert bool(np.asarray(bad))


def test_batch_cdf_builder_validates_degenerate_pdfs():
    """build_stable_quantized_cdf_batch must raise on degenerate pdfs like
    the scalar builder instead of silently corrupting the stream."""
    import pytest
    from encodec_tpu.stream.ac import (build_stable_quantized_cdf,
                                       build_stable_quantized_cdf_batch)
    over = np.full((3, 16), 0.5, np.float32)
    with pytest.raises((ValueError, AssertionError)):
        build_stable_quantized_cdf_batch(over, 24)
    with pytest.raises((ValueError, AssertionError)):
        build_stable_quantized_cdf(over[0], 24)
    neg = np.full((3, 16), -1.0, np.float32)
    with pytest.raises(ValueError):
        build_stable_quantized_cdf_batch(neg, 24)
    with pytest.raises(ValueError):
        build_stable_quantized_cdf(neg[0], 24)
    # check=False preserves the unchecked fast path explicitly
    build_stable_quantized_cdf_batch(neg, 24, check=False)


def test_corrupt_ecdc_files_raise_clean_errors():
    """User-facing robustness: bad magic / unsupported version / truncated
    header or body must raise the reference's error types (ValueError /
    EOFError, ref binary.py:47-50, 33-40), never crash deeper or return
    garbage audio."""
    import io
    import pytest
    from encodec_tpu.models.model import build_model
    from encodec_tpu.stream.compress import compress, decompress

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False)
    model.set_target_bandwidth(1.5)
    reg = {model.name: (lambda pretrained=True: model)}
    wav = np.random.RandomState(0).randn(1, 4800).astype(np.float32) * 0.3
    data = compress(model, wav, models=reg)

    # sanity: intact file decodes
    out, sr = decompress(data, models=reg)
    assert out.shape == (1, 4800)

    with pytest.raises(ValueError, match="ECDC"):
        decompress(b"XXXX" + data[4:], models=reg)
    bad_version = bytearray(data)
    bad_version[4] = 7
    with pytest.raises(ValueError, match="[Vv]ersion"):
        decompress(bytes(bad_version), models=reg)
    with pytest.raises(EOFError):
        decompress(data[:6], models=reg)          # truncated header
    with pytest.raises(EOFError):
        decompress(data[:-20], models=reg)        # truncated body
