"""CLI and audio IO tests (in-process, with an injected tiny model)."""

import sys

import numpy as np
import pytest

from encodec_tpu.utils.audio import load_wav, save_wav, convert_audio


def test_load_reference_fixture():
    wav, sr = load_wav("/root/reference/test_24k.wav")
    assert sr == 24000
    assert wav.shape[0] == 1
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 4800) * 0.1).astype(np.float32)
    save_wav(wav, tmp_path / "x.wav", 48000)
    back, sr = load_wav(tmp_path / "x.wav")
    assert sr == 48000
    np.testing.assert_allclose(back, wav, atol=2e-4)


def test_save_wav_clipping_and_rescale(tmp_path):
    wav = np.array([[0.0, 2.0, -2.0]], np.float32)
    save_wav(wav, tmp_path / "clip.wav", 8000)
    clipped, _ = load_wav(tmp_path / "clip.wav")
    assert np.abs(clipped).max() <= 0.991
    save_wav(wav, tmp_path / "resc.wav", 8000, rescale=True)
    rescaled, _ = load_wav(tmp_path / "resc.wav")
    np.testing.assert_allclose(np.abs(rescaled).max(), 0.99, atol=1e-3)


def test_convert_audio_channels_and_resample():
    wav = np.random.RandomState(1).randn(2, 1000).astype(np.float32)
    mono = convert_audio(wav, 1000, 1000, 1)
    np.testing.assert_allclose(mono, wav.mean(0, keepdims=True), rtol=1e-6)
    stereo = convert_audio(mono, 1000, 1000, 2)
    assert stereo.shape == (2, 1000)
    down = convert_audio(wav, 1000, 500, 2)
    assert down.shape == (2, 500)


@pytest.fixture
def tiny_registry(monkeypatch):
    """Replace the pretrained 24 kHz factory with a tiny random model."""
    from encodec_tpu.models.model import build_model
    import encodec_tpu.models.model as model_mod

    def tiny_24k(pretrained=True, repository=None):
        return build_model([1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24000,
                           channels=1, causal=True, model_norm="weight_norm",
                           name="encodec_24khz", ratios=[8, 5, 4, 2], bins=1024,
                           dimension=32, n_filters=2)

    monkeypatch.setitem(model_mod.MODELS, "encodec_24khz", tiny_24k)
    return tiny_24k


def _run_cli(argv):
    from encodec_tpu.__main__ import main
    old = sys.argv
    sys.argv = ["encodec_tpu"] + argv
    try:
        main()
    finally:
        sys.argv = old


def test_cli_compress_decompress_roundtrip(tmp_path, tiny_registry):
    wav, sr = load_wav("/root/reference/test_24k.wav")
    short = wav[:, :24000]
    save_wav(short, tmp_path / "in.wav", sr)

    ecdc = tmp_path / "out.ecdc"
    _run_cli([str(tmp_path / "in.wav"), str(ecdc), "-b", "6"])
    assert ecdc.exists()
    data = ecdc.read_bytes()
    # 6 kbps × 1 s ≈ 750 bytes + header
    assert 600 < len(data) < 1200, len(data)

    out_wav = tmp_path / "out.wav"
    _run_cli([str(ecdc), str(out_wav)])
    decoded, osr = load_wav(out_wav)
    assert osr == 24000
    assert decoded.shape == (1, 24000)


def test_cli_full_cycle_wav_to_wav(tmp_path, tiny_registry):
    wav, sr = load_wav("/root/reference/test_24k.wav")
    save_wav(wav[:, :12000], tmp_path / "in.wav", sr)
    _run_cli([str(tmp_path / "in.wav"), str(tmp_path / "cycle.wav"), "-b", "3"])
    out, osr = load_wav(tmp_path / "cycle.wav")
    assert out.shape == (1, 12000)


def test_cli_refuses_overwrite(tmp_path, tiny_registry):
    save_wav(np.zeros((1, 2400), np.float32), tmp_path / "in.wav", 24000)
    (tmp_path / "in.ecdc").write_bytes(b"x")
    with pytest.raises(SystemExit):
        _run_cli([str(tmp_path / "in.wav"), str(tmp_path / "in.ecdc")])


def test_cli_rejects_bad_bandwidth_for_hq(tmp_path):
    save_wav(np.zeros((1, 2400), np.float32), tmp_path / "in.wav", 24000)
    with pytest.raises(SystemExit):
        _run_cli([str(tmp_path / "in.wav"), "-q", "-b", "1.5"])


@pytest.fixture
def tiny_hq_registry(monkeypatch):
    """Tiny 48 kHz-style model under the hq name (segments + normalize)."""
    from encodec_tpu.models.model import build_model
    import encodec_tpu.models.model as model_mod

    def tiny_48k(pretrained=True, repository=None):
        return build_model([3.0, 6.0, 12.0, 24.0], sample_rate=48000,
                           channels=2, causal=False,
                           model_norm="time_group_norm", audio_normalize=True,
                           segment=1.0, name="encodec_48khz",
                           ratios=[8, 5, 4, 2], bins=1024, dimension=32,
                           n_filters=2)

    monkeypatch.setitem(model_mod.MODELS, "encodec_48khz", tiny_48k)
    return tiny_48k


def test_cli_hq_stereo_roundtrip(tmp_path, tiny_hq_registry):
    wav, sr = load_wav("/root/reference/test_48k.wav")
    short = wav[:, :96000]  # 2 s stereo -> 3 segments
    save_wav(short, tmp_path / "in48.wav", sr)
    ecdc = tmp_path / "out48.ecdc"
    _run_cli([str(tmp_path / "in48.wav"), str(ecdc), "-q", "-b", "6"])
    data = ecdc.read_bytes()
    # 6 kbps at 150 Hz tokens x 2 s + header/scales
    assert 1300 < len(data) < 2400, len(data)
    _run_cli([str(ecdc), str(tmp_path / "out48.wav")])
    decoded, osr = load_wav(tmp_path / "out48.wav")
    assert osr == 48000
    assert decoded.shape == (2, 96000)


def test_cli_default_output_name_keeps_dotted_stem(tmp_path, tiny_registry):
    """night.v2.ecdc → night.v2_decompressed.wav (with_suffix would have
    mangled the dotted stem into night.wav)."""
    wav, sr = load_wav("/root/reference/test_24k.wav")
    save_wav(wav[:, :12000], tmp_path / "in.wav", sr)
    ecdc = tmp_path / "night.v2.ecdc"
    _run_cli([str(tmp_path / "in.wav"), str(ecdc), "-b", "3"])
    import os
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        _run_cli([str(ecdc)])
    finally:
        os.chdir(cwd)
    assert (tmp_path / "night.v2_decompressed.wav").exists()


def test_frame_signal_too_short_raises():
    import jax.numpy as jnp
    import pytest
    from encodec_tpu.ops.stft import frame_signal
    with pytest.raises(ValueError, match="shorter than n_fft"):
        frame_signal(jnp.zeros((1, 200)), n_fft=256, hop=64)


@pytest.mark.slow
def test_cli_lm_roundtrip_offline_repository(tmp_path, tiny_registry):
    """--lm with --repository works fully offline for BOTH directions: a
    reference-format LM checkpoint in the local repository is used for
    compression AND for decompression (r2 review finding: decompress
    previously ignored --repository for the LM and hit the network)."""
    import torch
    from tests import ref_loader
    ref_model = ref_loader.load("encodec.model")

    # synthesize the published LM checkpoint layout (ref model.py:265-284:
    # n_q=32, card=1024, dim=200, 5 layers) under its published filename
    torch.manual_seed(0)
    lm_ref = ref_model.LMModel(n_q=32, card=1024, dim=200, num_layers=5,
                               past_context=262)
    repo = tmp_path / "repo"
    repo.mkdir()
    torch.save(lm_ref.state_dict(), repo / "encodec_lm_24khz-1608e3c0.th")

    wav, sr = load_wav("/root/reference/test_24k.wav")
    save_wav(wav[:, :12000], tmp_path / "in.wav", sr)
    ecdc = tmp_path / "out.ecdc"
    _run_cli([str(tmp_path / "in.wav"), str(ecdc), "-b", "6", "--lm",
              "--repository", str(repo)])
    assert ecdc.exists()
    out_wav = tmp_path / "out.wav"
    _run_cli([str(ecdc), str(out_wav), "--repository", str(repo)])
    decoded, osr = load_wav(out_wav)
    assert osr == 24000 and decoded.shape == (1, 12000)


def test_save_wav_int16_passthrough(tmp_path):
    """int16 input (from decode(pcm16=True)) is written through unchanged
    — byte-identical to saving the float audio it was quantized from."""
    rng = np.random.RandomState(3)
    f = (rng.randn(2, 500) * 0.3).astype(np.float32)
    save_wav(f, tmp_path / "f.wav", 24000)
    pcm = np.trunc(np.clip(f, -0.99, 0.99)
                   * np.float32(32767.0)).astype(np.int16)
    save_wav(pcm, tmp_path / "i.wav", 24000)
    assert (tmp_path / "i.wav").read_bytes() == \
        (tmp_path / "f.wav").read_bytes()
    back, sr = load_wav(tmp_path / "i.wav")
    assert sr == 24000 and back.shape == (2, 500)
