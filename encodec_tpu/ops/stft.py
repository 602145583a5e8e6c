"""Short-time Fourier transform with torch.stft-compatible semantics.

Used by the spectrogram reconstruction losses and the MS-STFT discriminator.
Matches torch.stft(center=False) behavior: frames of length `n_fft` taken
every `hop`, a `win_length` window zero-padded to `n_fft` centered, one-sided
rFFT. Framing is a gather + one batched rFFT — XLA lowers the FFT natively
on TPU and fuses the windowing.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def hann_window(win_length: int, dtype=jnp.float32) -> Array:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def frame_signal(x: Array, n_fft: int, hop: int) -> Array:
    """`[..., T]` → `[..., num_frames, n_fft]` (center=False framing)."""
    T = x.shape[-1]
    if T < n_fft:
        # torch.stft(center=False) raises here too; an empty frame axis
        # would silently turn downstream means into NaN
        raise ValueError(
            f"signal length {T} is shorter than n_fft {n_fft}")
    num_frames = 1 + (T - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


def stft(x: Array, n_fft: int, hop_length: int, win_length: int,
         window: tp.Optional[Array] = None, onesided: bool = True) -> Array:
    """torch.stft(center=False)-compatible complex STFT.

    x: `[..., T]` → `[..., freq, frames]` complex64 with
    freq = n_fft//2 + 1 (onesided).
    """
    if window is None:
        window = hann_window(win_length, x.dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    frames = frame_signal(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    if not onesided:
        raise NotImplementedError
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(x: Array, n_fft: int, hop_length: int, win_length: int,
                normalized: bool = True, power: tp.Optional[float] = None):
    """torchaudio.transforms.Spectrogram(center=False) equivalent.

    `normalized=True` divides by `sqrt(sum(window**2))` (torchaudio's
    "window" normalization). `power=None` returns the complex STFT.
    """
    window = hann_window(win_length, jnp.float32)
    spec = stft(x, n_fft, hop_length, win_length, window)
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(jnp.square(window)))
    if power is None:
        return spec
    mag = jnp.abs(spec)
    if power == 1.0:
        return mag
    return mag ** power
