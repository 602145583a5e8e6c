"""Data pipeline (layer L8): breathing datasets, preprocessing, sampling."""

from .preprocess import (  # noqa: F401
    label_to_interval,
    signal_std,
    signal_normalize,
    signal_crop,
    norm_sig,
    signal_crop_motion,
    detect_motion_iterative,
    detect_static_signal,
)
from .dataset import BreathingDataset, MergedDataset, DataLoader  # noqa: F401
