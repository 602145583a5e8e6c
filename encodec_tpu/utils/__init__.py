"""Utility subpackage: weight conversion, audio IO, overlap-add."""

from .convert import (  # noqa: F401
    conv1d_params_from_torch,
    conv_transpose1d_params_from_torch,
    lstm_params_from_torch,
    linear_from_torch,
)
