"""Signal-processing library for respiration data.

Behavioral reference: encodec/data/preprocess.py — motion-artifact
normalization (detect_motion_iterative 197-221), robust std (257-264),
crop/normalize helpers (188-194), static-signal detection (173-185), label
standardization (358-420) and Butterworth filters (422-436). Pure
numpy/scipy — this runs in data-loading workers on the host, feeding
fixed-shape batches to the device.
"""

from __future__ import annotations

import typing as tp

import numpy as np


def label_to_interval(label: np.ndarray, val=0) -> np.ndarray:
    """[start, end) intervals where `label == val` (ref preprocess.py:283)."""
    hit = (np.asarray(label) == val).astype(int).ravel()
    a = np.diff(np.concatenate([[0], hit, [0]]))
    left = np.where(a == 1)[0]
    right = np.where(a == -1)[0]
    return np.array(list(zip(left, right)), dtype=np.int32).reshape(-1, 2)


def signal_std(signal: np.ndarray) -> float:
    """Trimmed std: drop the top/bottom 10% of values (ref 257-264)."""
    if len(signal) < 10:
        return 1.0
    cut = int(len(signal) * 0.1)
    std = float(np.std(np.sort(signal)[cut:-cut]))
    return 1.0 if std == 0 else std


def signal_normalize(signal: np.ndarray) -> np.ndarray:
    signal = signal - np.mean(signal)
    return signal / signal_std(signal)


def signal_crop(signal: np.ndarray, clip_limit: float = 6.0) -> np.ndarray:
    return np.clip(signal, -clip_limit, clip_limit)


def norm_sig(input_sig: np.ndarray) -> np.ndarray:
    return (input_sig - np.mean(input_sig)) / np.std(input_sig)


def signal_crop_motion(signal: np.ndarray, window: float = 10,
                       fs: float = 10, threshold: float = 5):
    """Drop samples within `window` seconds of high-amplitude motion
    (ref preprocess.py:272-281)."""
    from scipy.ndimage import minimum_filter1d
    signal_norm = signal_normalize(signal)
    threshold = max(np.max(np.abs(signal_norm)) * 0.5, threshold)
    normal_part = np.abs(signal_norm) < threshold
    normal_part = minimum_filter1d(normal_part, int(window * fs))
    indices = np.where(normal_part == 1)[0]
    return signal_norm[indices], indices


def detect_motion_iterative(signal: np.ndarray, fs: float = 10,
                            level: int = 3):
    """Recursive motion-artifact normalization (ref preprocess.py:197-221).

    Splits the signal at motion events, renormalizes each stable span by its
    trimmed std (recursing up to `level` times), rescales the gaps between
    spans by the preceding span's ratio and clips to ±8.
    Returns (normalized_signal, right_most_ratio, motion_mask).
    """
    signal = np.asarray(signal, dtype=np.float64).copy()
    motion = np.ones(len(signal), dtype=int)
    right_most_ratio = 1.0
    if level == 0 or len(signal) < 30 * fs:
        std = signal_std(signal)
        signal = signal / std
        right_most_ratio = 1.0 / std
        motion *= 0
    else:
        cropped, indices = signal_crop_motion(signal, window=10, threshold=10,
                                              fs=fs)
        # the reference's signal_normalize subtracts the mean *in place* on
        # the working buffer (preprocess.py:268) — reproduce that mutation
        signal = signal - np.mean(signal)
        if level == 3 and len(cropped) == len(signal):
            cropped, indices = signal_crop_motion(signal, window=10,
                                                  threshold=6, fs=fs)
            signal = signal - np.mean(signal)
        motion[indices] = 0
        stable_periods = label_to_interval(motion, 0)
        for i, (p0, p1) in enumerate(stable_periods):
            # note: the reference recursion drops the fs argument, always
            # recursing at the default fs=10 (preprocess.py:211)
            norm_seg, right_r, motion_seg = detect_motion_iterative(
                signal[p0:p1], fs=10, level=level - 1)
            signal[p0:p1] = norm_seg
            motion[p0:p1] = motion_seg
            if i != len(stable_periods) - 1:
                signal[p1:stable_periods[i + 1][0]] *= right_r
            else:
                right_most_ratio = right_r
    signal = np.clip(signal, -8, 8)
    return signal, right_most_ratio, motion


def detect_static_signal(signal: np.ndarray, fs: float = 10):
    """Flag spans whose sample-to-sample diff stays under a threshold for
    30 s (flat / disconnected sensor; ref preprocess.py:173-185)."""
    from scipy.ndimage import minimum_filter1d
    signal = np.asarray(signal).copy()
    sig_diff = np.diff(np.concatenate([[0.0], signal]))
    static_part = sig_diff < 0.02
    static_part = minimum_filter1d(static_part, int(30 * fs))
    indices = np.where(static_part == 1)[0]
    non_static = np.where(static_part == 0)[0]
    return static_part, 1 - static_part, non_static


def detect_constant_windows(signal: np.ndarray, fs: float = 10,
                            window_sec: float = 30.0,
                            std_threshold: float = 1e-6) -> np.ndarray:
    """Sliding-window zero/constant detection — the blocklist criterion of
    the reference's offline curation (data/get_fns_to_ignore.py). Returns
    [start, end) intervals of constant spans."""
    win = max(1, int(window_sec * fs))
    if len(signal) < win:
        return np.zeros((0, 2), np.int32)
    # rolling std via cumulative sums
    x = np.asarray(signal, np.float64)
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])
    n = len(x) - win + 1
    s1 = c1[win:] - c1[:-win]
    s2 = c2[win:] - c2[:-win]
    var = np.maximum(s2 / win - (s1 / win) ** 2, 0.0)
    flat = np.sqrt(var) < std_threshold
    mask = np.zeros(len(x), bool)
    idx = np.where(flat)[0]
    for i in idx:
        mask[i:i + win] = True
    return label_to_interval(mask.astype(int), 1)


# ---------------------------------------------------------------------------
# Label standardization (ref preprocess.py:358-420)
# ---------------------------------------------------------------------------

_STAGE_MAP = {0: 0, 1: 1, 2: 2, 3: 3, 4: 3, 5: 4}  # AASM collapse of R&K


def stage_mapping(stages: np.ndarray) -> np.ndarray:
    return np.vectorize(lambda s: _STAGE_MAP.get(int(s), 0))(stages)


def standardize_stage(stages: np.ndarray, epoch_length: int = 30,
                      fs: int = 10) -> np.ndarray:
    return np.repeat(stage_mapping(stages), epoch_length * fs, axis=0)


def standardize_apnea(apnea_events, signal_length: int, fs: int = 10,
                      mapping: tp.Optional[tp.Callable[[str], int]] = None) -> np.ndarray:
    labels = np.zeros(signal_length, dtype=np.int32)
    mapping = mapping or (lambda name: 1)
    for event_name, start, duration in apnea_events:
        labels[int(start * fs):int((start + duration) * fs)] = mapping(event_name)
    return labels


def standardize_arousal(events, length: int, fs: int = 256) -> np.ndarray:
    labels = np.zeros(length, dtype=np.int32)
    for _name, start, duration in events:
        labels[int(start * fs):int((start + duration) * fs)] = 1
    return labels


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------

def butter_bandpass_filter(data, cutoff1, cutoff2, fs, order=5):
    from scipy.signal import butter, lfilter
    nyq = 0.5 * fs
    b, a = butter(order, [cutoff1 / nyq, cutoff2 / nyq], btype="band")
    return lfilter(b, a, data)


def butter_lowpass_filter(data, cutoff, fs, order=5):
    from scipy.signal import butter, lfilter
    nyq = 0.5 * fs
    b, a = butter(order, cutoff / nyq, btype="low")
    return lfilter(b, a, data)
