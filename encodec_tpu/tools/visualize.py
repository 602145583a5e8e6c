"""Reconstruction diagnostics and codebook-hierarchy ablation.

Behavioral reference: encodec/visualize.py — signal/spectrogram
reconstruction figures (infer 280-423) and the hierarchy ablation: decode
from a contiguous subset of RVQ stages to see what each level contributes
(testing_hierarchy 262-277); plus the per-epoch figures train.py:290-313.
"""

from __future__ import annotations

import typing as tp

import numpy as np

import jax.numpy as jnp

from ..losses.spectrogram import breathing_spectrogram


def reconstruction_figure(x: np.ndarray, x_hat: np.ndarray, *,
                          sampling_rate: int = 10, n_fft: int = 512,
                          win_length: tp.Optional[int] = None,
                          hop_length: tp.Optional[int] = None,
                          path: tp.Optional[str] = None):
    """Original vs reconstructed signal + spectrograms (4-panel figure,
    ref train.py:290-313). x, x_hat: `[T]` mono signals. Returns the figure
    (saves to `path` when given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    S_x = np.asarray(breathing_spectrogram(
        jnp.asarray(x, jnp.float32)[None], sampling_rate, n_fft,
        hop_length, win_length))[0]
    S_hat = np.asarray(breathing_spectrogram(
        jnp.asarray(x_hat, jnp.float32)[None], sampling_rate, n_fft,
        hop_length, win_length))[0]
    nf = S_x.shape[0] // 2
    S_x, S_hat = S_x[:nf], S_hat[:nf]
    vmin = min(S_x.min(), S_hat.min())
    vmax = max(S_x.max(), S_hat.max())

    fig, axs = plt.subplots(4, 1, figsize=(20, 10), sharex=True)
    t = np.arange(len(x))
    axs[0].plot(t, x)
    axs[0].set_title("Original")
    axs[0].set_ylim(-6, 6)
    axs[1].imshow(S_x, cmap="jet", aspect="auto",
                  extent=[0, len(x), 0, nf], vmin=vmin, vmax=vmax)
    axs[1].invert_yaxis()
    axs[1].set_title("Original Spectrogram")
    axs[2].plot(t[:len(x_hat)], x_hat)
    axs[2].set_title("Reconstructed")
    axs[2].set_ylim(-6, 6)
    axs[3].imshow(S_hat, cmap="jet", aspect="auto",
                  extent=[0, len(x), 0, nf], vmin=vmin, vmax=vmax)
    axs[3].invert_yaxis()
    axs[3].set_title("Reconstructed Spectrogram")
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig


def hierarchy_ablation(model, x: np.ndarray, *, start: int = 0,
                       depth: tp.Optional[int] = None) -> np.ndarray:
    """Decode using only RVQ stages `[start, start+depth)` — the reference's
    codebook-hierarchy probe (visualize.py:262-277). x: `[C, T]`.
    Returns `[C, T']` audio reconstructed from that slice of the residual
    hierarchy."""
    from ..models.seanet import seanet_encoder
    from ..quant import rvq_encode

    xt = jnp.asarray(x, jnp.float32).T[None]         # [1, T, C]
    emb = seanet_encoder(model.params["encoder"], xt, model.cfg.seanet)
    codes = rvq_encode(model.qstate, emb, model.cfg.rvq)   # [K, 1, T]
    n_q = codes.shape[0]
    depth = depth or (n_q - start)
    end = min(start + depth, n_q)

    # rebuild the partial quantized sum from stages start..end (shared
    # codebook: every stage indexes the same table — no need to tile it)
    shared = model.cfg.rvq.shared_codebook
    def book(k):
        return model.qstate.embed[0 if shared else k]
    partial = jnp.sum(
        jnp.stack([book(k)[codes[k]] for k in range(start, end)]), axis=0)
    from ..models.seanet import seanet_decoder
    out = seanet_decoder(model.params["decoder"], partial, model.cfg.seanet)
    return np.asarray(out[0]).T


def _save_or_return(fig, path):
    import matplotlib.pyplot as plt
    if path:
        fig.savefig(path, dpi=300, bbox_inches="tight")
        plt.close(fig)
    return fig


def data_distribution_figure(items: tp.Iterable[np.ndarray], *,
                             bins: int = 74, value_range=(-6.0, 6.0),
                             title: str = "Histogram",
                             path: tp.Optional[str] = None):
    """Aggregate value histogram over a dataset's signals (ref
    visualize.py get_data_distribution 156-193): one normalized histogram
    accumulated item by item so full nights never sit in memory at once.
    `items` yields arrays of any shape (e.g. `ds[i]["x"]`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bin_edges = np.linspace(value_range[0], value_range[1], bins + 1)
    histogram = np.zeros(bins)
    for x in items:
        if x is None:
            continue
        histogram += np.histogram(np.asarray(x), bins=bin_edges)[0]
    histogram = histogram / max(1.0, histogram.sum())

    fig = plt.figure(figsize=(8, 6))
    plt.bar(bin_edges[:-1], histogram, width=np.diff(bin_edges),
            edgecolor="black", align="edge")
    plt.xlabel("Feature Value")
    plt.ylabel("Frequency")
    plt.title(title)
    plt.grid(True)
    return _save_or_return(fig, path)


def patients_distribution_figure(items: tp.Sequence[dict], *,
                                 grid=(6, 6), bins: int = 49,
                                 value_range=(-4.0, 4.0),
                                 path: tp.Optional[str] = None):
    """Per-item value histograms on a grid (ref get_patients_distribution
    195-229). `items` are dataset dicts with 'x' and 'filename'."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows, cols = grid
    fig, axes = plt.subplots(rows, cols, figsize=(20, 10))
    axes = np.atleast_1d(axes).flatten()
    bin_edges = np.linspace(value_range[0], value_range[1], bins + 1)
    for ax, item in zip(axes, items):
        x = np.asarray(item["x"])
        histogram = np.histogram(x, bins=bin_edges)[0].astype(np.float64)
        histogram /= max(1.0, histogram.sum())
        ax.bar(bin_edges[:-1], histogram, width=np.diff(bin_edges),
               edgecolor="black", align="edge")
        ax.set_title(f"File {str(item.get('filename', ''))[:6]}")
        ax.set_xlim(-6, 6)
        ax.grid(True)
    return _save_or_return(fig, path)


def zero_runs_figure(items: tp.Iterable[np.ndarray], *,
                     window: int = 200 * 5, bins: int = 99,
                     path: tp.Optional[str] = None):
    """Histogram of constant-window ("zero-run") positions, normalized by
    signal length (ref get_zeros 426-514, minus its breakpoint() debugging):
    a sliding window is flagged when every sample equals its first sample —
    the sensor-dropout signature the offline curation blocklists."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bin_edges = np.linspace(0.0, 1.0, bins + 1)
    histogram = np.zeros(bins)
    for x in items:
        x = np.asarray(x).reshape(-1)
        if x.shape[0] < window:
            continue
        view = np.lib.stride_tricks.sliding_window_view(x, window)
        all_same = np.all(view == view[:, :1], axis=1)
        idx = np.flatnonzero(all_same)
        if idx.size:
            histogram += np.histogram(idx / x.shape[0], bins=bin_edges)[0]
    total = histogram.sum()
    if total > 0:
        histogram = histogram / total

    fig = plt.figure(figsize=(8, 6))
    plt.bar(bin_edges[:-1], histogram, width=np.diff(bin_edges),
            edgecolor="black", align="edge")
    plt.xlabel("Index Value")
    plt.ylabel("Frequency")
    plt.title("Histogram of 0 indices")
    plt.grid(True)
    return _save_or_return(fig, path)
