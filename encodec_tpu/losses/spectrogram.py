"""Breathing-spectrogram reconstruction losses.

Behavioral reference: encodec/my_code/spectrogram_loss.py
(BreathingSpectrogram 7-76, create_breathing_frequency_weight 79-109,
ReconstructionLoss 112-177, ReconstructionLosses 180-202).

The spectrogram is a log10-power STFT with a long window (default 30 s of
signal), reflect-padded so frames align with the reference, normalized by
the window sum. The loss weights each time-frequency bin by a Gaussian
centered on the per-frame dominant ("breathing") frequency and combines
weighted L1 + alpha * L2; the dominant-bin match rate is reported as an
accuracy metric.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from ..ops.stft import stft, hann_window

Array = jnp.ndarray


def breathing_spectrogram(signal: Array, sampling_rate: int = 10,
                          n_fft: int = 256,
                          hop_length: tp.Optional[int] = None,
                          win_length: tp.Optional[int] = None) -> Array:
    """log10 power spectrogram of `[B, T]` (or `[B, 1, T]`) → `[B, F, frames]`."""
    if signal.ndim == 3:
        assert signal.shape[1] == 1, "Input signal must be [B, 1, T]"
        signal = signal[:, 0]
    win_length = win_length or 30 * sampling_rate
    hop_length = hop_length or 5 * sampling_rate
    assert win_length <= n_fft, (
        f"win_length {win_length} must be <= n_fft {n_fft} "
        "(torch.stft semantics; pass win_length explicitly)")
    p = (n_fft - hop_length) // 2
    signal = jnp.pad(signal, ((0, 0), (p, p)), mode="reflect")
    window = hann_window(win_length, jnp.float32)
    spec = stft(signal, n_fft, hop_length, win_length, window)
    spec = spec / jnp.sum(window)
    power = jnp.square(jnp.abs(spec))
    return jnp.log10(jnp.clip(power, min=1e-5))


def breathing_frequency_weight(S_x: Array, breathing_rate: Array,
                               bandwidth: tp.Optional[float] = 1.0) -> Array:
    """Gaussian weight around the per-frame dominant frequency bin.
    S_x: [B, F, T]; breathing_rate: [B, T] (argmax bins)."""
    if bandwidth is None:
        return jnp.ones_like(S_x)
    B, F, T = S_x.shape
    bins = jnp.arange(F, dtype=jnp.float32)[None, :, None]
    center = breathing_rate[:, None, :].astype(jnp.float32)
    weight = jnp.exp(-jnp.square(bins - center) / (2 * bandwidth ** 2) + 1e-8)
    weight = weight / jnp.max(weight, axis=1, keepdims=True)
    return jnp.clip(weight, 1e-3, 1.0)


def reconstruction_loss(x: Array, x_hat: Array, *, alpha: float = 0.01,
                        bandwidth: tp.Optional[float] = None,
                        sampling_rate: int = 10, n_fft: int = 1024,
                        hop_length: tp.Optional[int] = None,
                        win_length: tp.Optional[int] = None) -> tp.Dict[str, Array]:
    """Weighted spectral L1+L2 with breathing-rate accuracy.

    x, x_hat: `[B, 1, T]` or `[B, T]` waveforms (same shapes both)."""
    S_x = breathing_spectrogram(x, sampling_rate, n_fft, hop_length, win_length)
    S_x_hat = breathing_spectrogram(x_hat, sampling_rate, n_fft, hop_length,
                                    win_length)
    rate_x = jnp.argmax(S_x, axis=1)
    rate_hat = jnp.argmax(S_x_hat, axis=1)
    acc = jnp.mean((rate_x == rate_hat).astype(jnp.float32))

    # reference keeps bins < 0.5/bin_freq = n_fft — a no-op slice on the
    # (n_fft//2+1)-bin spectrogram; preserved for fidelity
    keep = min(n_fft, S_x.shape[1])
    S_x = S_x[:, :keep]
    S_x_hat = S_x_hat[:, :keep]

    weight = breathing_frequency_weight(S_x, rate_x, bandwidth)
    l1 = jnp.mean(jnp.abs(S_x - S_x_hat) * weight)
    l2 = jnp.mean(jnp.square(S_x - S_x_hat) * weight)
    return {
        "total_loss": l1 + l2 * alpha,
        "l1_loss": l1,
        "l2_loss": l2,
        "acc": acc,
        "Sx_breathing_rate": rate_x,
        "Sx_hat_breathing_rate": rate_hat,
        "S_x": S_x,
        "S_x_hat": S_x_hat,
    }


def multi_reconstruction_loss(x: Array, x_hat: Array, *, alpha: float = 0.01,
                              bandwidth: tp.Optional[float] = None,
                              sampling_rate: int = 10, n_fft: int = 1024,
                              hop_lengths=(None,), win_lengths=(None,)):
    """Multi-resolution wrapper (ref ReconstructionLosses 180-202)."""
    assert len(hop_lengths) == len(win_lengths)
    results = [reconstruction_loss(x, x_hat, alpha=alpha, bandwidth=bandwidth,
                                   sampling_rate=sampling_rate, n_fft=n_fft,
                                   hop_length=h, win_length=w)
               for h, w in zip(hop_lengths, win_lengths)]
    n = len(results)
    pick = results[1] if n > 1 else results[0]
    return {
        "total_loss": sum(r["total_loss"] for r in results) / n,
        "l1_loss": sum(r["l1_loss"] for r in results) / n,
        "l2_loss": sum(r["l2_loss"] for r in results) / n,
        "acc": pick["acc"],
        "Sx_breathing_rate": pick["Sx_breathing_rate"],
        "Sx_hat_breathing_rate": pick["Sx_hat_breathing_rate"],
        "S_x": pick["S_x"],
        "S_x_hat": pick["S_x_hat"],
    }
