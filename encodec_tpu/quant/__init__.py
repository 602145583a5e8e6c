"""Residual vector quantization (layer L2).

Functional RVQ with explicit codebook state — the TPU-native replacement for
the reference's buffer-mutating EuclideanCodebook/ResidualVectorQuantization
(encodec/quantization/core_vq.py). All training-time state (EMA codebooks,
cluster sizes, init flag) is a pytree threaded through the train step, so
data-parallel synchronization is just "compute globally under pjit" — no
side-band broadcast/sync calls.
"""

from .rvq import (  # noqa: F401
    RVQConfig,
    RVQState,
    init_rvq,
    rvq_encode,
    rvq_decode,
    rvq_forward,
    num_quantizers_for_bandwidth,
    bandwidth_per_quantizer,
)
