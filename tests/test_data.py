"""Data pipeline tests: preprocessing parity + dataset/loader behavior
on synthetic npz fixtures."""


import numpy as np
import pytest

from encodec_tpu.data import (BreathingDataset, MergedDataset, DataLoader,
                              detect_motion_iterative, label_to_interval,
                              signal_std, signal_crop_motion)
from encodec_tpu.data.preprocess import detect_constant_windows
from tests import ref_loader

ref_pre = ref_loader.load("encodec.data.preprocess")


def test_label_to_interval_parity():
    rng = np.random.RandomState(0)
    label = (rng.rand(200) > 0.7).astype(int)
    for val in (0, 1):
        ours = label_to_interval(label, val)
        theirs = ref_pre.label_to_interval(label, val)
        np.testing.assert_array_equal(ours, np.asarray(theirs).reshape(-1, 2))


def test_signal_std_parity():
    rng = np.random.RandomState(1)
    for n in (5, 50, 1000):
        sig = rng.randn(n) * 3
        assert abs(signal_std(sig) - ref_pre.signal_std(sig)) < 1e-9


def test_crop_motion_parity():
    rng = np.random.RandomState(2)
    sig = rng.randn(2000)
    sig[500:520] += 40  # motion burst
    ours, idx = signal_crop_motion(sig, window=10, threshold=10, fs=10)
    theirs, ref_idx = ref_pre.signal_crop_motion(sig, window=10, threshold=10,
                                                 fs=10)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def _motion_cases():
    rng = np.random.RandomState(3)
    one = np.sin(np.arange(4000) * 0.2) + 0.1 * rng.randn(4000)
    one[1000:1060] += 30
    # several bursts -> multiple stable spans, exercises the gap rescaling
    # between consecutive spans and the trailing-ratio bookkeeping
    multi = np.sin(np.arange(9000) * 0.17) + 0.1 * rng.randn(9000)
    for at in (1200, 3500, 3900, 7000):
        multi[at:at + 80] += 25 * rng.randn(80)
    # clean signal -> first split keeps everything, triggering the
    # level-3 tighter-threshold retry path
    clean = np.sin(np.arange(2000) * 0.2) + 0.05 * rng.randn(2000)
    # wall-to-wall artifact -> no stable span at all
    storm = 40.0 * rng.randn(1500)
    short = rng.randn(100)  # below 30 s -> plain trimmed-std base case
    # nested artifacts: huge bursts split the night into long spans, and
    # each span carries its own smaller bursts that only the *sub*-split's
    # rescaled threshold catches -> exercises depth-2/3 of the tree and
    # the gap rescaling at two levels simultaneously
    nested = np.sin(np.arange(20000) * 0.13) + 0.1 * rng.randn(20000)
    for at in (5000, 13000):
        nested[at:at + 120] += 200 * rng.randn(120)
    for at in (1500, 8000, 16500):
        nested[at:at + 60] += 18 * rng.randn(60)
    return {"one": one, "multi": multi, "clean": clean, "storm": storm,
            "short": short, "nested": nested}


@pytest.mark.parametrize("case", ["one", "multi", "clean", "storm", "short",
                                  "nested"])
def test_detect_motion_iterative_parity(case):
    sig = _motion_cases()[case]
    ours, r_ours, m_ours = detect_motion_iterative(sig, fs=10)
    theirs, r_ref, m_ref = ref_pre.detect_motion_iterative(sig, fs=10)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(m_ours, m_ref)
    assert abs(r_ours - r_ref) < 1e-10


def test_detect_constant_windows():
    sig = np.random.RandomState(4).randn(5000)
    sig[1000:1600] = 0.0
    spans = detect_constant_windows(sig, fs=10, window_sec=30)
    assert len(spans) == 1
    s, e = spans[0]
    assert s <= 1000 and e >= 1590


@pytest.fixture
def synth_root(tmp_path):
    """Two synthetic datasets with thorax/abdominal channels."""
    rng = np.random.RandomState(0)
    for ds in ("dsA", "dsB"):
        for chan in ("thorax", "abdominal"):
            d = tmp_path / ds / chan
            d.mkdir(parents=True)
            for i in range(8):
                T = 3000 + 200 * i
                sig = np.sin(np.arange(T) * 0.3) + 0.1 * rng.randn(T)
                np.savez(d / f"night{i}.npz", data=sig.astype(np.float32),
                         fs=10)
    return str(tmp_path)


def test_breathing_dataset_split_and_items(synth_root):
    tr = BreathingDataset(synth_root, "dsA", mode="train", cv=0,
                          channels={"thorax": 0.5, "abdominal": 0.5},
                          max_length=2000,
                          rng=np.random.RandomState(0))
    va = BreathingDataset(synth_root, "dsA", mode="val", cv=0,
                          channels={"thorax": 1.0}, max_length=2000)
    te = BreathingDataset(synth_root, "dsA", mode="test", cv=0,
                          channels={"thorax": 1.0}, max_length=2000)
    assert len(tr) == 6 and len(va) == 2 and len(te) == 8
    item = tr[0]
    assert item["x"].shape == (1, 2000)
    # sign convention: majority non-positive
    x = item["x"]
    assert (x > 0).sum() <= (x < 0).sum()
    # blocklist drops files
    bl = BreathingDataset(synth_root, "dsA", mode="test",
                          channels={"thorax": 1.0},
                          blocklist=["night0.npz"])
    assert len(bl) == 7


def test_merged_dataset_and_loader(synth_root):
    rng = np.random.RandomState(1)
    dsA = BreathingDataset(synth_root, "dsA", mode="train", max_length=1500,
                           rng=rng)
    dsB = BreathingDataset(synth_root, "dsB", mode="train", max_length=1500,
                           rng=rng)
    merged = MergedDataset([dsA, dsB], [1.0, 1.0], sfreq=0.01, debug=True,
                           rng=rng)
    assert len(merged) == 5  # 512 * 0.01 rounded
    loader = DataLoader(merged, batch_size=2, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    batch, ds_ids = batches[0]
    assert batch["x"].shape == (2, 1500, 1)
    assert batch["x"].dtype == np.float32
    assert set(np.unique(ds_ids)) <= {0, 1}


def test_analysis_utils_parity():
    """SNR scoring, sleep bounds, AHI, interpolation, local std — vs ref."""
    from encodec_tpu.data.preprocess import (
        signal_snr, get_sleep_start_end, AHI, one_runs, interpol_signal,
        interpol_signal_2d, compute_local_std_1d, stage_mapping,
        apnea_mapping, trend, normalize_signals_percentile)
    rng = np.random.RandomState(0)

    # SNR
    t = np.arange(1000) / 5.0
    sig = np.sin(2 * np.pi * 0.25 * t) + 0.1 * rng.randn(1000)
    snr, scores = signal_snr(sig, fs=5)
    snr_ref, scores_ref = ref_pre.signal_snr(sig, fs=5)
    np.testing.assert_allclose(snr, snr_ref, rtol=1e-10)
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-10)

    # sleep bounds
    stages = np.zeros(600, int)
    stages[50:400] = 2
    stages[420:500] = 1
    assert get_sleep_start_end(stages.copy()) == \
        tuple(ref_pre.get_sleep_start_end(stages.copy()))

    # AHI + one_runs
    apnea = np.zeros(36000, int)
    apnea[1000:1300] = 1
    apnea[9000:9200] = 2
    stage = np.ones(36000, int)
    nums, hours = AHI(apnea, stage, 18000)
    nums_ref, hours_ref = ref_pre.AHI(apnea, stage, 18000)
    np.testing.assert_allclose(nums, nums_ref)
    np.testing.assert_allclose(hours, hours_ref)
    np.testing.assert_array_equal(one_runs(apnea > 0),
                                  ref_pre.one_runs(apnea > 0))

    # interpolation
    s = rng.randn(101)
    for old_f, new_f in [(10, 5), (5, 10), (5, 25)]:
        np.testing.assert_allclose(
            interpol_signal(s, old_f, new_f),
            ref_pre.interpol_signal(s, old_f, new_f), rtol=1e-8)
    s2 = rng.randn(3, 101)
    np.testing.assert_allclose(
        interpol_signal_2d(s2, 5, 10),
        ref_pre.interpol_signal_2d(s2, 5, 10), rtol=1e-5, atol=1e-6)

    # local std
    norm, std = compute_local_std_1d(50, rng.randn(500).astype("float32"))
    norm_ref, std_ref = ref_pre.compute_local_std_1d(
        50, norm * std)  # reconstruct same input
    assert norm.shape == (500,)

    # stage / apnea mapping
    st = np.array([0, 1, 2, 3, 4, 5, 6])
    np.testing.assert_array_equal(stage_mapping(st.copy()),
                                  ref_pre.stage_mapping(st.copy()))
    for name, val in [("Hypopnea", 1), ("Obstructive Apnea", 2),
                      ("Central Apnea", 3), ("Mixed Apnea", 4)]:
        assert apnea_mapping(name) == ref_pre.apnea_mapping(name) == val

    # trend/detrend + percentile normalization
    x = rng.randn(400)
    np.testing.assert_allclose(trend(x), ref_pre.trend(x), rtol=1e-10)
    np.testing.assert_allclose(
        normalize_signals_percentile(x.copy()),
        ref_pre.normalize_signals_percentile(x.copy()), rtol=1e-10)


def test_dataloader_workers_match_serial(synth_root):
    """Threaded prefetching yields the same batches as the serial path."""
    def make(num_workers):
        rng = np.random.RandomState(5)
        ds = BreathingDataset(synth_root, "dsA", mode="val", max_length=1500,
                              channels={"thorax": 1.0}, rng=rng)
        return DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                          num_workers=num_workers, prefetch=2)

    serial = list(make(0))
    threaded = list(make(3))
    assert len(serial) == len(threaded) == 1
    for (b0, d0), (b1, d1) in zip(serial, threaded):
        np.testing.assert_array_equal(b0["x"], b1["x"])
        assert b0["filename"] == b1["filename"]
        np.testing.assert_array_equal(d0, d1)
    # single worker must not deadlock
    single = list(make(1))
    np.testing.assert_array_equal(single[0][0]["x"], serial[0][0]["x"])


def test_dataloader_workers_match_serial_train_multichannel(synth_root):
    """Train mode with per-item random channel + crop draws: threaded
    loading must reproduce the serial path exactly (per-item RandomState
    derived from (seed, epoch, index) — a shared RandomState would
    interleave draws across threads nondeterministically)."""
    def make(num_workers):
        rng = np.random.RandomState(5)
        sets = [BreathingDataset(synth_root, ds, mode="train",
                                 max_length=1500,
                                 channels={"thorax": 0.5, "abdominal": 0.5},
                                 rng=rng) for ds in ("dsA", "dsB")]
        merged = MergedDataset(sets, [0.5, 0.5], sfreq=0.01, debug=True,
                               rng=rng)
        return DataLoader(merged, batch_size=2, shuffle=True, seed=7,
                          num_workers=num_workers, prefetch=2)

    serial = list(make(0))
    threaded = list(make(4))
    assert len(serial) == len(threaded) >= 2
    for (b0, d0), (b1, d1) in zip(serial, threaded):
        np.testing.assert_array_equal(b0["x"], b1["x"])
        assert b0["filename"] == b1["filename"]
        assert b0["selected_channel"] == b1["selected_channel"]
        np.testing.assert_array_equal(d0, d1)
    # draws vary across epochs (epoch is part of the per-item seed)
    loader = make(0)
    e1 = list(loader)
    e2 = list(loader)
    assert any(not np.array_equal(a[0]["x"], b[0]["x"])
               for a, b in zip(e1, e2))
    # and across items (channel selection actually varies)
    chans = {c for b, _ in serial for c in b["selected_channel"]}
    assert len(chans) == 2
