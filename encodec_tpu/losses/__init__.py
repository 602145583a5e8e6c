"""Losses & GAN machinery (layer L5)."""

from .gan import total_loss, disc_loss  # noqa: F401
from .spectrogram import (  # noqa: F401
    breathing_spectrogram,
    breathing_frequency_weight,
    reconstruction_loss,
    multi_reconstruction_loss,
)
from .balancer import Balancer, init_balancer_state, balance, averager  # noqa: F401
