"""Pallas TPU kernels for the codec's hot ops."""

from .vq_pallas import nearest_codebook_pallas  # noqa: F401
