"""Pallas TPU kernels for the codec's hot ops."""

from .vq_pallas import (  # noqa: F401
    nearest_codebook_pallas,
    rvq_encode_pallas,
)
