"""Bitstream / entropy coding (layer L4) — host-side, bit-exact.

The `.ecdc` container, LSB-first bit packing and the streaming range coder
live on the host CPU by design: they are inherently sequential and byte
oriented, while everything upstream of them (encoder, RVQ, LM probabilities)
is batched TPU work. The split mirrors the reference's own benchmark
structure (benchmark.py:50-73): evaluate the LM for all timesteps on the
accelerator, then stream CDFs through the coder.
"""

from .binary import (  # noqa: F401
    BitPacker,
    BitUnpacker,
    pack_bits,
    unpack_bits,
    write_ecdc_header,
    read_ecdc_header,
)
from .ac import (  # noqa: F401
    ArithmeticCoder,
    ArithmeticDecoder,
    build_stable_quantized_cdf,
)
from .compress import (  # noqa: F401
    compress,
    decompress,
    compress_to_file,
    decompress_from_file,
)
