"""End-to-end model parity (codes + audio) and .ecdc roundtrips."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from encodec_tpu.models.model import build_model, EncodecModel
from encodec_tpu.models.torch_zoo import model_params_from_torch
from encodec_tpu.stream import compress, decompress
from tests import ref_loader

ref_seanet = ref_loader.load("encodec.modules.seanet")
core_vq = ref_loader.load("encodec.quantization.core_vq")
ref_vq = ref_loader.load("encodec.quantization.vq")


def _build_ref_pieces(dimension=16, n_filters=4, ratios=(8, 5, 4, 2), bins=64,
                      n_q=4, causal=True, norm="weight_norm", channels=1,
                      independent=True, seed=0):
    torch.manual_seed(seed)
    enc = ref_seanet.SEANetEncoder(channels=channels, dimension=dimension,
                                   n_filters=n_filters, ratios=list(ratios),
                                   causal=causal, norm=norm)
    dec = ref_seanet.SEANetDecoder(channels=channels, dimension=dimension,
                                   n_filters=n_filters, ratios=list(ratios),
                                   causal=causal, norm=norm)
    quant = ref_vq.ResidualVectorQuantizer(dimension=dimension, n_q=n_q,
                                           bins=bins, codebook_dim=dimension,
                                           kmeans_init=False)
    if independent:
        quant.vq.layers = torch.nn.ModuleList(
            [core_vq.VectorQuantization(dim=dimension, codebook_size=bins,
                                        codebook_dim=dimension,
                                        kmeans_init=False)
             for _ in range(n_q)])
    for m in (enc, dec, quant):
        m.eval()
    state = {}
    for root, m in [("encoder.", enc), ("decoder.", dec), ("quantizer.", quant)]:
        for k, v in m.state_dict().items():
            state[root + k] = v.detach().numpy()
    return enc, dec, quant, state


def _our_model(state, *, dimension=16, n_filters=4, ratios=(8, 5, 4, 2),
               bins=64, n_q=4, causal=True, norm="weight_norm", channels=1,
               independent=True, sample_rate=24000, segment=None,
               normalize=False, name="test_model",
               target_bandwidths=(1.5, 3.0)) -> EncodecModel:
    model = build_model(list(target_bandwidths), sample_rate=sample_rate,
                        channels=channels, causal=causal, model_norm=norm,
                        audio_normalize=normalize, segment=segment, name=name,
                        ratios=list(ratios), bins=bins, dimension=dimension,
                        n_filters=n_filters,
                        # the reference fork hard-codes the decoder's final
                        # conv to norm='none' (seanet.py:228)
                        decoder_final_norm="none",
                        shared_codebook=not independent)
    # override n_q (build_model derives it from bandwidths via the ref formula)
    import dataclasses
    rvq = dataclasses.replace(model.cfg.rvq, n_q=n_q)
    cfg = dataclasses.replace(model.cfg, rvq=rvq)
    params, qstate = model_params_from_torch(state, cfg)
    return EncodecModel(cfg, params, qstate)


def test_full_pipeline_code_parity_24k_style():
    """Upstream semantics: encoder → RVQ indices → decoder. Code indices
    must match the torch oracle exactly; audio within float tolerance."""
    enc, dec, quant, state = _build_ref_pieces()
    model = _our_model(state)

    torch.manual_seed(42)
    x = torch.randn(2, 1, 2003)
    with torch.no_grad():
        emb = enc(x)
        codes_ref = quant.encode(emb, 75, None).numpy()   # [K, B, T]
        decoded_ref = dec(quant.decode(torch.tensor(codes_ref))).numpy()

    frames = model.encode(jnp.asarray(x.numpy()))
    assert len(frames) == 1
    codes, scale = frames[0]
    assert scale is None
    np.testing.assert_array_equal(
        np.asarray(codes), codes_ref.transpose(1, 0, 2))  # [B, K, T]

    out = model.decode(frames)
    np.testing.assert_allclose(np.asarray(out), decoded_ref,
                               rtol=1e-4, atol=1e-4)


def test_full_pipeline_48k_style_normalize_segments():
    """Non-causal group-norm stereo model with 1s segments + normalization."""
    enc, dec, quant, state = _build_ref_pieces(
        causal=False, norm="time_group_norm", channels=2, seed=3)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True)
    torch.manual_seed(5)
    x = torch.randn(1, 2, 4800 * 2 + 100)  # 3 segments (stride 4752)
    frames = model.encode(jnp.asarray(x.numpy()))
    assert len(frames) == 3
    for codes, scale in frames:
        assert scale is not None
    out = model.decode(frames)
    assert out.shape[0] == 1 and out.shape[1] == 2
    assert out.shape[2] >= x.shape[2]

    # oracle for the first full segment
    with torch.no_grad():
        seg = x[:, :, :4800]
        mono = seg.mean(dim=1, keepdim=True)
        volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
        scale_ref = 1e-8 + volume
        emb = enc(seg / scale_ref)
        codes_ref = quant.encode(emb, 15, None).numpy()
    np.testing.assert_array_equal(np.asarray(frames[0][0]),
                                  codes_ref.transpose(1, 0, 2))
    np.testing.assert_allclose(np.asarray(frames[0][1]).reshape(-1),
                               scale_ref.numpy().reshape(-1), rtol=1e-5)


def test_forward_fork_semantics():
    """Fork training forward: (x_hat, codes, commit, codebook)."""
    _, _, _, state = _build_ref_pieces(independent=False)
    model = _our_model(state, independent=False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 1280).astype(np.float32))
    x_hat, codes, commit, codebook = model(x)
    assert x_hat.shape == x.shape
    assert codes.shape[0] == 2 and codes.shape[1] == 4
    assert commit.shape == (4,)


def _registry(model):
    return {model.name: (lambda pretrained=True, m=model: m)}


def test_ecdc_roundtrip_no_lm():
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(3.0)  # n_q = 3000/(75*log2(64)) = 6 -> capped 4
    rng = np.random.RandomState(7)
    wav = rng.randn(1, 2003).astype(np.float32)
    data = compress(model, wav, use_lm=False, models=_registry(model))
    out, sr = decompress(data, models=_registry(model))
    assert sr == model.sample_rate
    assert out.shape == (1, 2003)
    # decompressed audio == direct encode/decode of the same model
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :2003]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)
    # explicit device placement (reference-signature `device` argument)
    out_dev, _ = decompress(data, models=_registry(model), device="cpu")
    np.testing.assert_array_equal(np.asarray(out_dev), np.asarray(out))


def test_ecdc_roundtrip_48k_style_segments():
    _, _, _, state = _build_ref_pieces(causal=False, norm="time_group_norm",
                                       channels=2, seed=11)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True, name="encodec_48khz")
    model.set_target_bandwidth(1.5)
    rng = np.random.RandomState(8)
    wav = rng.randn(2, 9000).astype(np.float32)
    data = compress(model, wav, use_lm=False, models=_registry(model))
    out, sr = decompress(data, models=_registry(model))
    assert out.shape == (2, 9000)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :9000]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_ecdc_roundtrip_with_lm():
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=20)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(0), lm_cfg))
    rng = np.random.RandomState(9)
    wav = rng.randn(1, 1600).astype(np.float32)
    data_lm = compress(model, wav, use_lm=True, lm=lm, models=_registry(model))
    data_raw = compress(model, wav, use_lm=False, models=_registry(model))
    out, sr = decompress(data_lm, models=_registry(model), lm=lm)
    assert out.shape == (1, 1600)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :1600]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)
    # a random LM shouldn't catastrophically inflate the stream
    assert len(data_lm) < 3 * len(data_raw)


def test_set_target_bandwidth_validation():
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state)
    with pytest.raises(ValueError):
        model.set_target_bandwidth(7.5)
    model.set_target_bandwidth(1.5)
    assert model.bandwidth == 1.5


def test_forward_48k_style_segments_matches_encode_decode():
    """Reference model.test() exercises forward on the segmented 48k model;
    forward must route through per-segment scale + overlap-add."""
    _, _, _, state = _build_ref_pieces(causal=False, norm="time_group_norm",
                                       channels=2, seed=21)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 4800 * 2).astype(np.float32))
    out, codes, commit, codebook = model(x)
    assert out.shape == (1, 2, 4800 * 2)
    frames = model.encode(x)
    ref_out = model.decode(frames)[:, :, :x.shape[-1]]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-6, atol=1e-7)
    assert codes.shape[-1] == sum(f[0].shape[-1] for f in frames)


def test_ecdc_roundtrip_48k_segments_with_lm_indexed():
    """Multi-segment LM streams: batched lockstep encode/decode with the
    per-frame byte-length index ("fl") in the header, ragged last segment
    included. Decoded audio must equal the direct encode/decode."""
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    _, _, _, state = _build_ref_pieces(causal=False, norm="time_group_norm",
                                       channels=2, seed=12)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True, name="encodec_48khz")
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=6)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(1), lm_cfg))
    lm.CODEC_CHUNK = 8                        # force several chunks
    rng = np.random.RandomState(13)
    wav = rng.randn(2, 10600).astype(np.float32)  # 2 full + 1 ragged segment
    data = compress(model, wav, use_lm=True, lm=lm, models=_registry(model))

    # the header carries the per-frame stream index
    import io as _io
    from encodec_tpu.stream import binary as _binary
    meta = _binary.read_ecdc_header(_io.BytesIO(data))
    assert "fl" in meta and len(meta["fl"]) == 3

    out, sr = decompress(data, models=_registry(model), lm=lm)
    assert out.shape == (2, 10600)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :10600]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_ecdc_roundtrip_lm_restart_blocks():
    """Opt-in lm_restart=R: a single-frame LM stream entropy-coded in
    independent R-token blocks (fresh LM state each) decodes in lockstep
    and reproduces the exact codes/audio; slightly larger than the
    contiguous stream (the prior loses context at block starts)."""
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=6)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(2), lm_cfg))
    lm.CODEC_CHUNK = 8
    rng = np.random.RandomState(14)
    wav = rng.randn(1, 3200).astype(np.float32)   # 10 tokens at hop 320
    data = compress(model, wav, use_lm=True, lm=lm, models=_registry(model),
                    lm_restart=4)                 # 3 blocks (4+4+2 ragged)
    import io as _io
    from encodec_tpu.stream import binary as _binary
    meta = _binary.read_ecdc_header(_io.BytesIO(data))
    assert meta["lmb"] == 4 and len(meta["fl"]) == 3
    out, sr = decompress(data, models=_registry(model), lm=lm)
    assert out.shape == (1, 3200)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :3200]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


def test_lm_restart_auto_default():
    """lm_restart='auto' (the CLI default) resolves to DEFAULT_LM_RESTART
    on single-frame LM streams, to None on segmented models, and to None
    without --lm (raw streams are unchanged)."""
    import io as _io
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    from encodec_tpu.stream import binary as _binary
    from encodec_tpu.stream.compress import DEFAULT_LM_RESTART
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=6)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(2), lm_cfg))
    lm.CODEC_CHUNK = 8
    rng = np.random.RandomState(15)
    wav = rng.randn(1, 3200).astype(np.float32)
    data = compress(model, wav, use_lm=True, lm=lm,
                    models=_registry(model), lm_restart="auto")
    meta = _binary.read_ecdc_header(_io.BytesIO(data))
    assert meta["lmb"] == DEFAULT_LM_RESTART
    out, _ = decompress(data, models=_registry(model), lm=lm)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :3200]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)
    # raw streams: auto resolves to None, bytes unchanged vs explicit None
    raw_auto = compress(model, wav, models=_registry(model),
                        lm_restart="auto")
    raw_none = compress(model, wav, models=_registry(model))
    assert raw_auto == raw_none

    # segmented models: auto resolves to None (no error, no lmb blocks)
    from encodec_tpu.stream.compress import _resolve_lm_restart

    class _Seg:
        segment_length = 480
    assert _resolve_lm_restart("auto", True, _Seg()) is None
    assert _resolve_lm_restart(4, True, _Seg()) == 4

    # CLI argument grammar
    from encodec_tpu.__main__ import _lm_restart_arg
    assert _lm_restart_arg("auto") == "auto"
    assert _lm_restart_arg("0") is None
    assert _lm_restart_arg("750") == 750


def test_lm_stream_generation_marker():
    """LM streams carry the 'lmv' generation marker; decoding an old-writer
    LM stream (no marker) raises loudly instead of desynchronizing
    (review r2 finding). lm_restart on segmented input errors explicitly."""
    import io as _io
    import pytest
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    from encodec_tpu.stream import binary as _binary
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=6)
    lm = LMModel(lm_cfg, init_lm(jax.random.PRNGKey(3), lm_cfg))
    wav = np.random.RandomState(15).randn(1, 1600).astype(np.float32)
    data = compress(model, wav, use_lm=True, lm=lm, models=_registry(model))
    meta = _binary.read_ecdc_header(_io.BytesIO(data))
    assert meta["lmv"] == 3          # portable integer-LM default writer
    data2 = compress(model, wav, use_lm=True, lm=lm,
                     models=_registry(model), portable=False)
    meta2 = _binary.read_ecdc_header(_io.BytesIO(data2))
    assert meta2["lmv"] == 2         # legacy pinned writer still available

    # forge an old-generation stream: same payload, marker stripped
    stripped = dict(meta)
    del stripped["lmv"]
    forged = _reheader(data, stripped)
    with pytest.raises(ValueError, match="older encoder generation"):
        decompress(forged, models=_registry(model), lm=lm)

    # lm_restart rejects segmented models explicitly
    _, _, _, state48 = _build_ref_pieces(causal=False,
                                         norm="time_group_norm",
                                         channels=2, seed=16)
    model48 = _our_model(state48, causal=False, norm="time_group_norm",
                         channels=2, sample_rate=4800, segment=1.0,
                         normalize=True, name="encodec_48khz")
    model48.set_target_bandwidth(1.5)
    wav48 = np.random.RandomState(17).randn(2, 9000).astype(np.float32)
    with pytest.raises(ValueError, match="single-frame"):
        compress(model48, wav48, use_lm=True, lm=lm,
                 models=_registry(model48), lm_restart=4)

    # lm_restart without use_lm is a user error, not a silent no-op
    with pytest.raises(ValueError, match="use_lm"):
        compress(model, np.random.RandomState(18).randn(1, 600).astype(
            np.float32), use_lm=False, models=_registry(model), lm_restart=4)


def _reheader(data: bytes, new_meta: dict) -> bytes:
    """Rewrite an .ecdc header with different metadata, keeping the body."""
    import io as _io
    from encodec_tpu.stream import binary as _binary
    fo = _io.BytesIO(data)
    _binary.read_ecdc_header(fo)           # advance past the old header
    body = fo.read()
    out = _io.BytesIO()
    _binary.write_ecdc_header(out, new_meta)
    return out.getvalue() + body


def test_ecdc_48k_scale_byte_interchange_with_reference():
    """48 kHz-style normalize path interchange (VERDICT r2 missing #4):
    a reference-written `.ecdc` with per-segment big-endian f32 scales
    (ref compress.py:62-63) must be byte-equal to ours, decode here, and
    our stream must decode through the reference's own
    decompress_from_file (ref compress.py:120-126)."""
    import math as _math

    ref_compress = ref_loader.load("encodec.compress")
    ref_utils = ref_loader.load("encodec.utils")

    enc, dec, quant, state = _build_ref_pieces(
        causal=False, norm="time_group_norm", channels=2, seed=21)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True, name="encodec_48khz")

    class _UpstreamAdapter:
        """Restores the upstream (codes, scale) encode/decode contract that
        the fork broke (ref model.py:197-210 returns dicts), so the
        reference's checked-in compress.py can drive its own torch pieces
        end to end."""
        name = "encodec_48khz"
        sample_rate = 4800
        channels = 2
        normalize = True
        segment = 1.0
        overlap = 0.01

        def __init__(self):
            self.frame_rate = _math.ceil(
                self.sample_rate / int(np.prod(enc.ratios)))
            self.bits_per_codebook = 6  # log2(bins=64)

        @property
        def segment_length(self):
            return int(self.segment * self.sample_rate)

        @property
        def segment_stride(self):
            return max(1, int((1 - self.overlap) * self.segment_length))

        def to(self, device):
            return self

        def encode(self, x):
            frames = []
            for off in range(0, x.shape[-1], self.segment_stride):
                seg = x[:, :, off: off + self.segment_length]
                mono = seg.mean(dim=1, keepdim=True)
                volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
                scale = 1e-8 + volume
                with torch.no_grad():
                    emb = enc(seg / scale)
                    codes = quant.encode(emb, self.frame_rate, None)
                frames.append((codes.transpose(0, 1), scale.view(-1)))
            return frames

        def decode(self, frames):
            outs = []
            for codes, scale in frames:
                with torch.no_grad():
                    emb = quant.decode(codes.transpose(0, 1))
                    out = dec(emb)
                outs.append(out * scale.view(-1, 1, 1))
            return ref_utils._linear_overlap_add(outs, self.segment_stride)

    adapter = _UpstreamAdapter()
    rng = np.random.RandomState(23)
    length = 4800 * 2 + 100                      # 3 segments, ragged tail
    wav = rng.randn(2, length).astype(np.float32)

    ref_bytes = ref_compress.compress(adapter, torch.from_numpy(wav),
                                      use_lm=False)
    our_bytes = compress(model, wav, use_lm=False, models=_registry(model))
    assert ref_bytes == our_bytes

    # this decoder reads the reference-written stream
    out, sr = decompress(ref_bytes, models=_registry(model))
    assert sr == 4800 and out.shape == (2, length)
    frames = model.encode(jnp.asarray(wav)[None])
    direct = model.decode(frames)[0, :, :length]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)

    # the reference decoder reads our stream (registry pointed at the
    # upstream-semantics adapter)
    saved = dict(ref_compress.MODELS)
    try:
        ref_compress.MODELS["encodec_48khz"] = lambda: adapter
        wav_ref, sr_ref = ref_compress.decompress(our_bytes)
    finally:
        ref_compress.MODELS.clear()
        ref_compress.MODELS.update(saved)
    assert sr_ref == 4800 and tuple(wav_ref.shape) == (2, length)
    np.testing.assert_allclose(wav_ref.numpy(), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_compress_refuses_tie_unsafe_nearest_backend():
    """.ecdc writing is guarded to the bitstream-reproducible 'xla' search
    path: the Pallas backends may flip exact-tie argmins across compiled
    executables (kernels/vq_pallas.py caveat), so compress() refuses them."""
    from encodec_tpu.quant.rvq import set_nearest_impl
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    wav = np.random.RandomState(3).randn(1, 640).astype(np.float32)
    try:
        set_nearest_impl("pallas_fused")
        with pytest.raises(RuntimeError, match="bitstream-reproducible"):
            compress(model, wav, use_lm=False, models=_registry(model))
    finally:
        set_nearest_impl("xla")
    # back on the parity path it writes fine
    assert compress(model, wav, use_lm=False, models=_registry(model))


def test_compress_precision_guard():
    """.ecdc writing refuses set_precision('fast') (single-pass bf16 flips
    near-tie codes) and allows 'high' (audited mode) with a warning."""
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    wav = np.random.RandomState(3).randn(1, 640).astype(np.float32)
    try:
        model.set_precision("fast")
        with pytest.raises(RuntimeError, match="refusing to write"):
            compress(model, wav, use_lm=False, models=_registry(model))
        model.set_precision("high")
        assert compress(model, wav, use_lm=False, models=_registry(model))
    finally:
        model.set_precision("highest")
    assert compress(model, wav, use_lm=False, models=_registry(model))


def _tiny_lm(model, seed=0):
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    lm_cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins, dim=16,
                      num_layers=2, past_context=20)
    return LMModel(lm_cfg, init_lm(jax.random.PRNGKey(seed), lm_cfg))


def test_lm_fast_decode_equals_safe_decode():
    """The cost-bounded pair-executable decoder and the same-executable
    fallback produce identical codes on the same stream (VERDICT r2 #2)."""
    import importlib
    compress_mod = importlib.import_module("encodec_tpu.stream.compress")
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm = _tiny_lm(model)
    wav = np.random.RandomState(11).randn(1, 3000).astype(np.float32)
    data = compress(model, wav, use_lm=True, lm=lm,
                    models=_registry(model), portable=False)

    import io as _io
    from encodec_tpu.stream import binary as _binary
    fo = _io.BytesIO(data)
    _binary.read_ecdc_header(fo)
    stream = fo.read()
    frames = model.encode(jnp.asarray(wav)[None])
    codes_true = np.asarray(frames[0][0])[0]            # [K, T]
    K, T = codes_true.shape
    fast = compress_mod._decode_frame_lm_fast(stream, lm, K, T)
    safe = compress_mod._decode_frame_lm_safe(stream, lm, K, T)
    np.testing.assert_array_equal(fast, codes_true)
    np.testing.assert_array_equal(safe, codes_true)


def test_lm_decode_selfcheck_fallback(monkeypatch):
    """A platform where the pair executable diverges is detected by the
    checksum self-check and decode transparently falls back to the
    same-executable path — simulated by corrupting the reference
    checksums."""
    import importlib
    compress_mod = importlib.import_module("encodec_tpu.stream.compress")
    from encodec_tpu.models.lm import LMModel
    _, _, _, state = _build_ref_pieces()
    model = _our_model(state, name="encodec_24khz")
    model.set_target_bandwidth(1.5)
    lm = _tiny_lm(model)
    wav = np.random.RandomState(12).randn(1, 2000).astype(np.float32)
    data = compress(model, wav, use_lm=True, lm=lm,
                    models=_registry(model), portable=False)

    # the batched checksum exec is the reference gate for every tier now
    # (the S=1 paths delegate to the lockstep cores); corrupting it fails
    # the fused device tier AND the pair-executable tier, landing on safe
    real_cs_exec = LMModel.batch_chunk_checksum_exec

    def corrupted(self):
        fn = real_cs_exec(self)
        return lambda pr: fn(pr) + 1          # every reference cs off by 1
    monkeypatch.setattr(LMModel, "batch_chunk_checksum_exec", corrupted)

    fallback_used = {}
    real_safe = compress_mod._decode_frame_lm_safe

    def spy(*a, **k):
        fallback_used["yes"] = True
        return real_safe(*a, **k)
    monkeypatch.setattr(compress_mod, "_decode_frame_lm_safe", spy)

    out, sr = decompress(data, models=_registry(model), lm=lm)
    assert fallback_used.get("yes"), "self-check did not trigger fallback"
    direct = model.decode(model.encode(jnp.asarray(wav)[None]))[0, :, :2000]
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


def test_bits_checksum_single_element_sensitivity():
    """Any single-element difference flips the checksum (odd weights: a
    nonzero delta times an odd weight is never 0 mod 2^32) — on float32
    bit patterns and on int32 CDF rows alike."""
    from encodec_tpu.models.lm import bits_checksum
    rng = np.random.RandomState(0)
    p = rng.rand(64, 4).astype(np.float32)
    base = int(bits_checksum(jnp.asarray(p)))
    for (i, j, bit) in [(0, 0, 0), (63, 3, 22), (17, 2, 31)]:
        q = p.copy()
        q_bits = q.view(np.uint32)
        q_bits[i, j] ^= np.uint32(1 << bit)
        assert int(bits_checksum(jnp.asarray(q))) != base
    rows = rng.randint(0, 1 << 24, size=(8, 1024)).astype(np.int32)
    base = int(bits_checksum(jnp.asarray(rows)))
    for (i, j, delta) in [(0, 0, 1), (7, 1023, -3), (3, 512, 1 << 20)]:
        q = rows.copy()
        q[i, j] += delta
        assert int(bits_checksum(jnp.asarray(q))) != base


def test_cdf_row_checksum_absorbs_subquantization_drift():
    """The self-check gates on quantized CDF rows, not probability bits:
    a probability perturbation too small to move any floor bucket leaves
    the per-position checksum unchanged (the fast tiers survive ulp-level
    cross-executable drift), while one that flips a single row entry is
    always detected. Verifies `batch_chunk_checksum_exec` against
    `batch_cdf_row_exec` layout equality along the way."""
    from encodec_tpu.models.lm import LMModel, LMConfig, init_lm
    from encodec_tpu.stream.device_cdf import quantized_cdf_rows
    S, K, card, C = 2, 3, 64, 5
    cfg = LMConfig(n_q=K, card=card, dim=16, num_layers=1, past_context=8)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    rng = np.random.RandomState(7)
    logits = rng.randn(S, card, K, C).astype(np.float32)
    pr = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))

    cs_exec = lm.batch_chunk_checksum_exec()
    rows_exec = lm.batch_cdf_row_exec()
    base = np.asarray(cs_exec(jnp.asarray(pr)))
    assert base.shape == (C,)
    # per-position row exec agrees with the chunk checksum exec
    for t in range(C):
        _, _, cs_t = rows_exec(jnp.asarray(pr), t)
        assert int(np.asarray(cs_t)) == int(base[t])

    # sub-quantization drift: nudge an element by 1 ulp only if that does
    # not move its floor bucket (scale*p crosses no integer boundary)
    scale = (1 - 2 * card / (1 << 24)) * (1 << 24) * (1 - 1e-5)
    drifted = pr.copy()
    n_nudged = 0
    for (s, c, k, t) in [(0, 5, 0, 0), (1, 40, 2, 3), (0, 63, 1, 4)]:
        p0 = drifted[s, c, k, t]
        p1 = np.nextafter(p0, np.float32(1.0), dtype=np.float32)
        if np.floor(np.float32(scale) * p0) == np.floor(np.float32(scale) * p1):
            drifted[s, c, k, t] = p1
            n_nudged += 1
    assert n_nudged > 0, "no nudgeable element found (test setup broken)"
    assert (drifted != pr).any()
    drifted_cs = np.asarray(cs_exec(jnp.asarray(drifted)))
    np.testing.assert_array_equal(drifted_cs, base)

    # a perturbation that flips one row entry must flip that position's
    # checksum: push one element across its floor boundary
    flipped = pr.copy()
    t_target = 2
    found = False
    for c in range(card):
        p0 = flipped[0, c, 0, t_target]
        p1 = np.float32(p0 + 1.5 / scale)
        if np.floor(np.float32(scale) * p0) != np.floor(np.float32(scale) * p1):
            flipped[0, c, 0, t_target] = p1
            found = True
            break
    assert found
    r0, _ = quantized_cdf_rows(jnp.transpose(jnp.asarray(pr[..., t_target]),
                                             (0, 2, 1)))
    r1, _ = quantized_cdf_rows(jnp.transpose(jnp.asarray(flipped[..., t_target]),
                                             (0, 2, 1)))
    assert (np.asarray(r0) != np.asarray(r1)).any()
    flipped_cs = np.asarray(cs_exec(jnp.asarray(flipped)))
    assert flipped_cs[t_target] != base[t_target]
    assert (np.delete(flipped_cs, t_target) == np.delete(base, t_target)).all()


def test_decode_irregular_layouts_fall_back(monkeypatch):
    """Fused segmented decode only claims the standard encode() layout;
    irregular frame lists (mixed scale presence, middle-frame length
    mismatch) route through the per-group path and still decode."""
    _, _, _, state = _build_ref_pieces(causal=False, norm="time_group_norm",
                                       channels=2, seed=31)
    model = _our_model(state, causal=False, norm="time_group_norm",
                       channels=2, sample_rate=4800, segment=1.0,
                       normalize=True, name="encodec_48khz")
    wav = np.random.RandomState(32).randn(2, 4800 * 2 + 100).astype(np.float32)
    frames = model.encode(jnp.asarray(wav)[None])
    regular = np.asarray(model.decode(frames))

    # mixed scale presence → not fused, same shapes out
    mixed = [frames[0], (frames[1][0], None), frames[2]]
    out = model.decode(mixed)
    assert out.shape == regular.shape

    # a middle frame shorter than the first → not fused
    irregular = [frames[0], (frames[1][0][:, :, :-3], frames[1][1]),
                 (frames[2][0][:, :, :-1], frames[2][1])]
    out2 = model.decode(irregular)
    assert out2.shape[0] == 1 and out2.shape[1] == 2

    # and the fused path was NOT taken for either (dispatcher returns None)
    assert model._decode_segments_fused(mixed) is None
    assert model._decode_segments_fused(irregular) is None


def test_pcm16_wire_format():
    """int16 wire path (production serving: half the host<->device audio
    bytes): encoding an int16 PCM input yields codes bit-identical to
    encoding the host-converted float (int16->f32 is exact), and
    `decode(pcm16=True)` reproduces save_wav's host quantizer exactly on
    both the unsegmented (24 kHz-style) and fused segmented+normalized
    (48 kHz-style) layouts."""
    rng = np.random.RandomState(0)
    cases = [
        ("24k", dict(sample_rate=24000, channels=1, causal=True,
                     model_norm="weight_norm", name="encodec_24khz",
                     ratios=[8, 5, 4, 2], bins=64, dimension=16,
                     n_filters=4, kmeans_init=False), (2, 1, 4807)),
        ("48k", dict(sample_rate=48000, channels=2, causal=False,
                     model_norm="time_group_norm", name="encodec_48khz",
                     ratios=[8, 5, 4, 2], bins=64, dimension=16,
                     n_filters=4, audio_normalize=True, segment=0.04,
                     kmeans_init=False), (1, 2, 48 * 90 + 13)),
    ]
    for name, kw, (B, C, T) in cases:
        m = build_model([1.5, 3.0], **kw)
        m.set_target_bandwidth(3.0)
        pcm = (rng.randn(B, C, T) * 0.2 * 32767).clip(-32768, 32767) \
            .astype(np.int16)
        f = pcm.astype(np.float32) / 32768.0
        fr_i = m.encode(jnp.asarray(pcm))
        fr_f = m.encode(jnp.asarray(f))
        for (ci, si), (cf, sf) in zip(fr_i, fr_f):
            np.testing.assert_array_equal(np.asarray(ci), np.asarray(cf),
                                          err_msg=name)
            if sf is not None:
                np.testing.assert_array_equal(np.asarray(si),
                                              np.asarray(sf), err_msg=name)
        out_f = np.asarray(m.decode(fr_f))
        out_i16 = np.asarray(m.decode(fr_f, pcm16=True))
        assert out_i16.dtype == np.int16 and out_i16.shape == out_f.shape
        host = np.trunc(np.clip(out_f, -0.99, 0.99)
                        * np.float32(32767.0)).astype(np.int16)
        # same quantizer over the same program output: in practice exact;
        # the pcm16 program is a different XLA compilation, so allow the
        # decode float-tolerance contract's ~1 LSB at isolated positions
        diff = np.abs(out_i16.astype(np.int32) - host.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, name
