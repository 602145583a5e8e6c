"""Primitive functional NN ops (layer L0 of the codec stack).

Everything here is a pure function over (params, inputs) with channels-last
`[B, T, C]` activations — the layout XLA tiles best onto the TPU MXU/VPU.
"""

from .pad import (  # noqa: F401
    get_extra_padding_for_conv1d,
    pad1d,
    unpad1d,
)
from .conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    sconv1d,
    sconv_transpose1d,
    init_sconv1d,
    init_sconv_transpose1d,
    fold_weight_norm,
    layer_norm,
    time_group_norm,
)
from .lstm import lstm, init_lstm, lstm_step  # noqa: F401
