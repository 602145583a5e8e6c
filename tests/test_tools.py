"""Tests for the L7 tools (inference, visualize, benchmark) and data
curation / BWH pipeline."""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from encodec_tpu.models.model import build_model
from encodec_tpu.tools.inference import (extract_codes, process_dataset,
                                         code_distribution,
                                         decode_most_frequent)
from encodec_tpu.tools.visualize import (reconstruction_figure,
                                         hierarchy_ablation)
from encodec_tpu.data.curation import (sliding_std, find_fns_to_ignore,
                                       clip_and_patch, curate_directory)
from encodec_tpu.data.bwh import BwhDataset


@pytest.fixture(scope="module")
def tiny_model():
    return build_model([0.08], sample_rate=10, channels=1, causal=True,
                       model_norm="layer_norm", name="breathing_model",
                       ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                       decoder_final_norm="none", shared_codebook=True,
                       kmeans_init=False, seed=3)


def test_extract_and_process_dataset(tiny_model, tmp_path):
    class FakeDS:
        dataset = "synth"

        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return {"x": rng.randn(1, 600).astype(np.float32),
                    "filename": f"n{i}.npz", "selected_channel": "thorax"}

    n = process_dataset(tiny_model, FakeDS(), str(tmp_path / "codes"))
    assert n == 3
    with np.load(tmp_path / "codes" / "thorax" / "n0.npz") as z:
        codes = z["codes"]
        fs = float(z["fs"])
    assert codes.shape == (8, 60)  # n_q=8, 600/10 tokens
    assert fs == 1.0               # 10 Hz / prod([5,2,1])


def test_code_distribution_and_most_frequent(tiny_model):
    rng = np.random.RandomState(0)
    x = rng.randn(1, 600).astype(np.float32)
    codes = extract_codes(tiny_model, x)
    dist = code_distribution(codes, bins=32)
    assert dist["counts"].shape == (8, 32)
    assert np.all(dist["entropy"] >= 0)
    audio = decode_most_frequent(tiny_model, dist["counts"], length=20)
    assert audio.shape == (1, 200)


def test_reconstruction_figure(tiny_model, tmp_path):
    rng = np.random.RandomState(1)
    x = rng.randn(600).astype(np.float32)
    frames = tiny_model.encode(jnp.asarray(x)[None, None])
    x_hat = np.asarray(tiny_model.decode(frames))[0, 0, :600]
    fig = reconstruction_figure(x, x_hat, n_fft=64, win_length=64,
                                hop_length=16,
                                path=str(tmp_path / "fig.png"))
    assert (tmp_path / "fig.png").exists()


def test_hierarchy_ablation(tiny_model):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 600).astype(np.float32)
    full = hierarchy_ablation(tiny_model, x, start=0)
    first2 = hierarchy_ablation(tiny_model, x, start=0, depth=2)
    tail = hierarchy_ablation(tiny_model, x, start=4)
    assert full.shape == first2.shape == tail.shape
    assert not np.allclose(full, first2)


def test_benchmark_tool_runs(tiny_model):
    from encodec_tpu.tools.benchmark import bench
    tiny_model.cfg.__dict__  # smoke: run on the tiny model, no LM
    model = tiny_model
    # give the tiny model a usable bandwidth list
    res = bench(model, lm=None, seconds=30.0, bandwidth=0.08, iters=2)
    assert res["encode_rtf"] > 0 and res["decode_rtf"] > 0


# ---------------------------------------------------------------------------
# curation + BWH
# ---------------------------------------------------------------------------

def test_sliding_std_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(500)
    w = 50
    got = sliding_std(x, w)
    naive = np.array([x[i:i + w].std() for i in range(len(x) - w + 1)])
    np.testing.assert_allclose(got, naive, atol=1e-8)


def test_find_fns_to_ignore(tmp_path):
    d = tmp_path / "thorax"
    d.mkdir()
    rng = np.random.RandomState(0)
    np.savez(d / "good.npz", data=rng.randn(1000), fs=10)
    np.savez(d / "short.npz", data=rng.randn(100), fs=10)
    flat = rng.randn(1000)
    flat[200:800] = 3.14
    np.savez(d / "flat.npz", data=flat, fs=10)
    ignored = find_fns_to_ignore(str(d), max_length=500)
    assert "short.npz" in ignored and "flat.npz" in ignored
    assert "good.npz" not in ignored


def test_clip_and_patch():
    rng = np.random.RandomState(0)
    n = 10000
    x = rng.randn(n)
    x[:400] = 0.0          # leading flat (first 25%)
    x[4000:4500] = 0.0     # interior flat
    x[-300:] = 0.0         # trailing flat (last 5%)
    out = clip_and_patch(x, window=100, min_valid=1000,
                         rng=np.random.RandomState(1))
    assert out is not None
    clipped, start, end, patches = out
    assert start >= 300 and end <= n - 200
    assert len(patches) == 1
    p0, p1 = patches[0]
    assert p0 <= 4000 and p1 >= 4450
    # interior patch got replaced with noise (nonzero)
    assert np.abs(clipped).min() >= 0  # smoke
    # mostly-flat file is rejected
    flat = np.zeros(n)
    flat[:500] = rng.randn(500)
    assert clip_and_patch(flat, window=100, min_valid=1000) is None


def test_curate_directory_and_bwh_dataset(tmp_path):
    raw = tmp_path / "thorax"
    raw.mkdir()
    rng = np.random.RandomState(0)
    fs200 = 200
    T = fs200 * 60 * 8   # 8 minutes at 200 Hz
    for i in range(4):
        sig = np.sin(np.arange(T) * 2 * np.pi * 0.3 / fs200) \
            + 0.05 * rng.randn(T)
        np.savez(raw / f"n{i}.npz", data=sig.astype(np.float32), fs=200)
    clipped_dir = tmp_path / "thorax_clipped"
    mapping, ignored = curate_directory(
        str(raw), str(clipped_dir), fs=200, window_sec=5.0,
        min_valid_hours=0.01, csv_path=str(tmp_path / "meta.csv"),
        blocklist_path=str(tmp_path / "ignore.py"))
    assert len(mapping) == 4 and not ignored
    assert (tmp_path / "meta.csv").exists()

    ds = BwhDataset(str(tmp_path), mode="val", max_length=600,
                    cache_dir=str(tmp_path / "cache"),
                    rng=np.random.RandomState(1))
    item = ds[0]
    assert item["x"].shape[0] == 1
    # val mode: 600*20 raw samples -> 600 at 10 Hz
    assert item["x"].shape[1] == 600

    # build the train cache, then train mode reads from it
    ds_train = BwhDataset(str(tmp_path), mode="train", max_length=500,
                          cache_dir=str(tmp_path / "cache"),
                          rng=np.random.RandomState(2))
    ds_train.build_cache()
    item = ds_train[0]
    assert item["x"].shape == (1, 500)


def test_inference_cli_main(tmp_path, monkeypatch):
    """End-to-end tools.inference CLI: config + checkpoint -> npz code dumps."""
    import sys
    import yaml
    from encodec_tpu.train import create_train_state, save_checkpoint
    from encodec_tpu.train.config import load_config
    from encodec_tpu.train.trainer import model_from_config

    cfg_dict = {
        "common": {"log_interval": 1, "max_epoch": 1, "seed": 0,
                   "gradient_clipping": True},
        "checkpoint": {"save_every": 1},
        "optimization": {"lr": 1e-3, "disc_lr": 1e-3},
        "loss": {"weight_l1": 1.0, "weight_l2": 0.0, "weight_commit": 0.0,
                 "weight_freq": 0.0, "weight_g": 0.0, "weight_feat": 0.0,
                 "alpha": 0.01, "bandwidth": None, "n_fft": 64,
                 "commit_start_epoch": 0},
        "lr_scheduler": {"warmup_epoch": 1},
        "model": {"ratios": [5, 2, 1], "bins": 32, "dimension": 16,
                  "target_bandwidths": [0.08], "train_discriminator": False,
                  "train_discriminator_start_epoch": 9,
                  "train_discriminator_prob": 0.0, "disc_hop_lengths": [16],
                  "disc_win_lengths": [64], "disc_n_ffts": [64],
                  "filters": 4, "audio_normalize": False, "causal": True,
                  "norm": "layer_norm", "segment": "None",
                  "name": "my_encodec", "sample_rate": 10, "channels": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.dump(cfg_dict))

    config = load_config(str(cfg_path))
    model = model_from_config(config)
    state, _, _ = create_train_state(model, None, seed=0)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(state, 1, ckpt)

    data_dir = tmp_path / "data" / "synth" / "thorax"
    data_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        np.savez(data_dir / f"n{i}.npz",
                 data=rng.randn(900).astype(np.float32), fs=10)

    from encodec_tpu.tools.inference import main
    argv = ["inf", "--config", str(cfg_path), "--checkpoint", str(ckpt),
            "--data_root", str(tmp_path / "data"), "--dataset", "synth",
            "--out", str(tmp_path / "codes")]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    files = sorted((tmp_path / "codes" / "thorax").glob("*.npz"))
    assert len(files) == 2
    with np.load(files[0]) as z:
        assert z["codes"].shape[1] == 90  # 900 samples / hop 10


def test_distribution_and_zero_run_figures(tmp_path):
    """visualize.py tail: data/patients distributions + zero-run detection
    (ref visualize.py:156-229, 426-514)."""
    from encodec_tpu.tools.visualize import (data_distribution_figure,
                                             patients_distribution_figure,
                                             zero_runs_figure)
    rng = np.random.RandomState(0)
    sigs = [rng.randn(3000).astype(np.float32) for _ in range(4)]
    p1 = tmp_path / "dist.png"
    data_distribution_figure(sigs, path=str(p1))
    assert p1.exists() and p1.stat().st_size > 0

    items = [{"x": s, "filename": f"night{i}.npz"}
             for i, s in enumerate(sigs)]
    p2 = tmp_path / "patients.png"
    patients_distribution_figure(items, grid=(2, 2), path=str(p2))
    assert p2.exists() and p2.stat().st_size > 0

    # plant a constant run and check it lands in the histogram
    bad = rng.randn(5000).astype(np.float32)
    bad[1000:2300] = 0.5
    import matplotlib
    matplotlib.use("Agg")
    p3 = tmp_path / "zeros.png"
    fig = zero_runs_figure([bad], window=1000, path=str(p3))
    assert p3.exists() and p3.stat().st_size > 0


def test_preprocess_tail_parity():
    """standardize_desaturation exact behavior (ref preprocess.py:382-387)
    and EEG spectrogram utilities produce well-formed output."""
    from encodec_tpu.data.preprocess import (standardize_desaturation,
                                             get_spec_eeg, whole_spec_eeg,
                                             EEG_SPEC_HEIGHT)
    ev = [("Hypopnea", 2.0, 3.0, 4), ("Central Apnea", 10.0, 2.5, 7)]
    out = standardize_desaturation(ev, 20, fs=1)
    exp = np.zeros(20, np.int32)
    exp[2:5] = 4
    exp[10:12] = 7
    np.testing.assert_array_equal(out, exp)
    # fs=2 doubles the span indexing
    out2 = standardize_desaturation(ev, 40, fs=2)
    assert out2[4:10].tolist() == [4] * 6

    x = np.random.RandomState(0).randn(256 * 30 * 8).astype(np.float64)
    s = get_spec_eeg(x, 4, 2)
    assert s.shape[0] == 4 * 32  # freq_threshold * window seconds
    spec = whole_spec_eeg(x, 4, 2, win_num=1)
    assert spec.shape[0] == EEG_SPEC_HEIGHT
    assert np.isfinite(spec).all() and (spec >= 0).all()


def test_whole_spec_eeg_short_signals():
    """pieces==1 keeps the front zero-pad (same columns per piece as longer
    signals); sub-piece signals raise a clear error (review r2 finding)."""
    import pytest
    from encodec_tpu.data.preprocess import whole_spec_eeg
    rng = np.random.RandomState(0)
    one_piece = rng.randn(256 * 4 * 1).astype(np.float64)     # exactly 1 piece
    two_piece = rng.randn(256 * 4 * 2).astype(np.float64)
    s1 = whole_spec_eeg(one_piece, 4, 2, win_num=1)
    s2 = whole_spec_eeg(two_piece, 4, 2, win_num=1)
    assert s2.shape[1] == 2 * s1.shape[1]     # per-piece column count equal
    with pytest.raises(ValueError, match="too short"):
        whole_spec_eeg(one_piece[:-1], 4, 2, win_num=1)


def test_find_constant_spans_matches_naive():
    """Vectorized run-length == the per-sample loop on random signals."""
    import numpy as np
    from encodec_tpu.data.curation import find_constant_spans
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(5, 200)
        window = rng.randint(2, 8)
        # coarse quantization creates plenty of constant runs
        x = np.round(rng.randn(n) * (0.5 if trial % 2 else 0.05), 1)
        same = np.concatenate([x[1:] == x[:-1], [False]])
        run = np.zeros(n, np.int64)
        count = 0
        for i in range(n - 1, -1, -1):
            count = count + 1 if same[i] else 0
            run[i] = count
        expected = np.where(run >= window - 1)[0]
        np.testing.assert_array_equal(find_constant_spans(x, window),
                                      expected)


def test_batch_compress_directory_bytes_equal_per_file(tmp_path):
    """tools.batch.compress_directory writes byte-identical .ecdc files to
    per-file compress_to_file (no-LM and LM) while routing causal models
    through the shared-executable streaming extractor — the contract that
    makes it safe to use for dataset sweeps."""
    import io
    import jax
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.stream.compress import compress_to_file
    from encodec_tpu.tools.batch import compress_directory
    from encodec_tpu.utils.audio import save_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    reg = {model.name: (lambda pretrained=True: model)}
    cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=64, dim=16, num_layers=1,
                   past_context=20)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))

    rng = np.random.RandomState(3)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    lengths = [2400, 3201, 4800 + 7]          # incl. non-hop-multiples
    for i, T in enumerate(lengths):
        save_wav(rng.randn(1, T).astype(np.float32) * 0.2,
                 in_dir / f"f{i}.wav", 24000)

    for use_lm in (False, True):
        out = tmp_path / ("out_lm" if use_lm else "out")
        paths = compress_directory(model, str(in_dir), str(out),
                                   use_lm=use_lm, lm=lm, models=reg,
                                   chunk_hops=8)
        assert len(paths) == len(lengths)
        from encodec_tpu.utils.audio import load_wav, convert_audio
        for i, p in enumerate(paths):
            wav, sr = load_wav(in_dir / f"f{i}.wav")
            wav = convert_audio(wav, sr, 24000, 1)
            ref = io.BytesIO()
            compress_to_file(model, np.asarray(wav), ref, use_lm=use_lm,
                             lm=lm, models=reg)
            assert open(p, "rb").read() == ref.getvalue(), (use_lm, p)


def test_batch_compress_warns_on_sub_chunk_files(tmp_path):
    """Files shorter than chunk_hops*hop fall back to per-length compiles;
    the tool must say so instead of silently eating a fresh XLA compile
    per file."""
    import pytest
    from encodec_tpu.models.model import build_model
    from encodec_tpu.tools.batch import compress_directory
    from encodec_tpu.utils.audio import save_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    rng = np.random.RandomState(7)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    save_wav(rng.randn(1, 2400).astype(np.float32) * 0.2,
             in_dir / "short.wav", 24000)
    with pytest.warns(UserWarning, match="shorter than the shared"):
        compress_directory(model, str(in_dir), str(tmp_path / "out"),
                           chunk_hops=64)   # chunk = 64*320 >> 2400


def test_batch_decompress_builds_model_and_lm_once(tmp_path, monkeypatch):
    """decompress_directory must build the model ONCE per model name and
    the LM ONCE per model name (lazily, on the first LM-coded file) — a
    fresh LMModel per file would re-jit every LM decode executable per
    file, the exact cost the tool exists to eliminate."""
    import jax
    import encodec_tpu.models.lm as lm_mod
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.tools.batch import (compress_directory,
                                         decompress_directory)
    from encodec_tpu.utils.audio import save_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=64, dim=16, num_layers=1,
                   past_context=20)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))

    rng = np.random.RandomState(11)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    for i in range(3):
        save_wav(rng.randn(1, 2400 + 320 * i).astype(np.float32) * 0.2,
                 in_dir / f"h{i}.wav", 24000)
    ec_dir = tmp_path / "ecdc"
    reg = {model.name: (lambda pretrained=True: model)}
    compress_directory(model, str(in_dir), str(ec_dir), use_lm=True,
                       lm=lm, models=reg, chunk_hops=8)

    factory_calls = []
    counted_reg = {model.name: (lambda pretrained=True:
                                (factory_calls.append(1), model)[1])}
    lm_calls = []
    monkeypatch.setattr(lm_mod, "get_lm_model",
                        lambda m, repository=None:
                        (lm_calls.append(1), lm)[1])
    paths = decompress_directory(str(ec_dir), str(tmp_path / "out"),
                                 models=counted_reg)
    assert len(paths) == 3
    assert len(factory_calls) == 1, factory_calls
    assert len(lm_calls) == 1, lm_calls


def test_batch_decompress_directory_matches_per_file(tmp_path):
    """tools.batch.decompress_directory: bucketed shared decoding matches
    per-file decompression within 1 int16 LSB (causality keeps padded tail
    codes out of the kept samples; XLA's length-dependent codegen leaves
    ~1-ulp float differences at isolated positions — decode's contract is
    float tolerance, BASELINE.md)."""
    import jax
    from encodec_tpu.models.model import build_model
    from encodec_tpu.stream.compress import (compress_to_file,
                                             decompress_from_file)
    from encodec_tpu.tools.batch import (compress_directory,
                                         decompress_directory)
    from encodec_tpu.utils.audio import save_wav, load_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    reg = {model.name: (lambda pretrained=True: model)}

    rng = np.random.RandomState(5)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    for i, T in enumerate([2400, 3201, 5600 + 13]):
        save_wav(rng.randn(1, T).astype(np.float32) * 0.2,
                 in_dir / f"g{i}.wav", 24000)
    ec_dir = tmp_path / "ecdc"
    compress_directory(model, str(in_dir), str(ec_dir), models=reg,
                       chunk_hops=8)

    out_dir = tmp_path / "wav_out"
    paths = decompress_directory(str(ec_dir), str(out_dir), models=reg)
    assert len(paths) == 3
    for i, p in enumerate(paths):
        batch_wav, _ = load_wav(p)
        with open(ec_dir / f"g{i}.ecdc", "rb") as fo:
            ref_wav, sr = decompress_from_file(fo, models=reg)
        save_wav(np.asarray(ref_wav), tmp_path / "ref.wav", sr)
        ref_rt, _ = load_wav(tmp_path / "ref.wav")
        diff = np.abs(batch_wav - ref_rt)
        assert diff.max() <= 1.01 / 32768, (p, diff.max())     # <= 1 LSB
        assert (diff > 0).mean() < 0.01, (p, (diff > 0).mean())


def test_batch_decompress_pcm16_matches_float_path(tmp_path):
    """pcm16=True: decoded wavs byte-match the float path's files (both
    end as PCM16 on disk; quantizing on device is the same quantizer)."""
    from encodec_tpu.models.model import build_model
    from encodec_tpu.tools.batch import (compress_directory,
                                         decompress_directory)
    from encodec_tpu.utils.audio import save_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    reg = {model.name: (lambda pretrained=True: model)}
    rng = np.random.RandomState(13)
    in_dir = tmp_path / "wavs"
    in_dir.mkdir()
    for i, T in enumerate([2400, 3201]):
        save_wav(rng.randn(1, T).astype(np.float32) * 0.2,
                 in_dir / f"p{i}.wav", 24000)
    ec = tmp_path / "ecdc"
    compress_directory(model, str(in_dir), str(ec), models=reg,
                       chunk_hops=8)
    out_f = decompress_directory(str(ec), str(tmp_path / "of"), models=reg)
    out_i = decompress_directory(str(ec), str(tmp_path / "oi"), models=reg,
                                 pcm16=True)
    mismatched = 0
    for pf, pi in zip(out_f, out_i):
        a = open(pf, "rb").read()
        b = open(pi, "rb").read()
        assert len(a) == len(b)
        # same executable family, but the pcm16 program is a separate XLA
        # compilation — tolerate the decode contract's ~1 LSB at isolated
        # positions rather than requiring byte equality
        wa = np.frombuffer(a[44:], np.int16).astype(np.int32)
        wb = np.frombuffer(b[44:], np.int16).astype(np.int32)
        d = np.abs(wa - wb)
        assert d.max() <= 1 and (d > 0).mean() < 0.01
        mismatched += int((d > 0).sum())
    assert mismatched <= 32  # sanity: isolated positions only


def test_batch_decompress_lockstep_matches_per_file(tmp_path):
    """Cross-file lockstep decode of portable (lmv=3) LM files: a mixed
    directory (4 ragged-length LM files + 1 raw file) decompressed with
    lockstep lanes is BYTE-identical to lockstep=1 (the per-file path) —
    the S-lane fused decoder computes the same exact integer arithmetic
    per lane and audio decoding goes through the same shared bucketed
    executables. A sub-lane split (lockstep=3 over 4 files) is covered,
    and a corrupted stream still fails its CRC with the file named."""
    import jax
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.tools.batch import (compress_directory,
                                         decompress_directory)
    from encodec_tpu.utils.audio import save_wav

    model = build_model([1.5], sample_rate=24000, channels=1, causal=True,
                        model_norm="weight_norm", name="encodec_24khz",
                        ratios=[8, 5, 4, 2], bins=64, dimension=16,
                        n_filters=4, kmeans_init=False, seed=0)
    model.set_target_bandwidth(1.5)
    cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=64, dim=16, num_layers=1,
                   past_context=20)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    reg = {model.name: (lambda pretrained=True: model)}

    rng = np.random.RandomState(17)
    lm_dir, raw_dir = tmp_path / "lmw", tmp_path / "raww"
    lm_dir.mkdir(), raw_dir.mkdir()
    for i, T in enumerate([2560, 3201, 2560, 4481]):
        save_wav(rng.randn(1, T).astype(np.float32) * 0.2,
                 lm_dir / f"s{i}.wav", 24000)
    save_wav(rng.randn(1, 2909).astype(np.float32) * 0.2,
             raw_dir / "raw.wav", 24000)
    ec = tmp_path / "ecdc"
    compress_directory(model, str(lm_dir), str(ec), use_lm=True, lm=lm,
                       models=reg, chunk_hops=8)
    compress_directory(model, str(raw_dir), str(ec), models=reg,
                       chunk_hops=8)

    out_ls = decompress_directory(str(ec), str(tmp_path / "ls"),
                                  models=reg, lm=lm, lockstep=3)
    out_pf = decompress_directory(str(ec), str(tmp_path / "pf"),
                                  models=reg, lm=lm, lockstep=1)
    assert len(out_ls) == len(out_pf) == 5
    for a, b in zip(out_ls, out_pf):
        assert os.path.basename(a) == os.path.basename(b)
        assert open(a, "rb").read() == open(b, "rb").read(), a

    # corrupt one LM stream's payload -> its CRC check must name the file
    victim = ec / "s2.ecdc"
    blob = bytearray(victim.read_bytes())
    blob[-3] ^= 0xFF
    victim.write_bytes(bytes(blob))
    with pytest.raises((ValueError, EOFError)) as exc_info:
        decompress_directory(str(ec), str(tmp_path / "bad"),
                             models=reg, lm=lm, lockstep=3)
    if isinstance(exc_info.value, ValueError):
        assert "s2" in str(exc_info.value)
