"""Device-side quantized-CDF math for the LM entropy codec.

The range coder (host, `stream.ac` / `native`) consumes integer CDFs built
from the LM's float32 probabilities. Building them on device avoids
transferring the full probability tensor (card floats per token ≈ 24 MB for
10 s of 24 kHz audio) — the encoder only needs the two CDF bounds of each
*known* symbol (8 bytes/token), and the decoder one CDF row per token.

Exactness contract: the builder uses ONLY operations that are exactly
rounded and fusion-proof in XLA — one f32 multiply, a floor, and an integer
cumsum (integer addition is associative, so even reduction order cannot
matter). Encoder and decoder therefore agree bit-for-bit across executables
on the same platform — the same pinning the LM probabilities already
require (see `models.lm.lm_scan_chunk`).

Deliberate deviation from the host builder (`stream.ac`, bit-matching the
reference encodec/quantization/ac.py:18-53): the reference first floors the
pdf to a multiple of `roundoff=1e-8` via a *division*, which exists to make
CDFs stable against ~1e-8 cross-platform noise in the probability model.
XLA's f32 division is not correctly rounded (measured ±1-ulp vs numpy), so
that step cannot be reproduced on device — and it is unnecessary here: the
device codec's probabilities are bit-exact between encode and decode by
construction. Instead, the scale is shaved by a relative 1e-5 safety margin
so that float32 softmax rows summing to 1+ε (the overflow the roundoff was
absorbing) can never exceed the total range — worth ~0.001% of bitrate.
Validity is still checked (`bad` flag) and raised on by the callers.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

Array = jnp.ndarray


def quantized_cdf_rows(pdf: Array, total_range_bits: int = 24,
                       min_range: int = 2) -> tp.Tuple[Array, Array]:
    """`[..., card]` float32 pdfs → (`[..., card]` int32 CDFs, bad flag).

    Same contract as `stream.ac.build_stable_quantized_cdf` (int64 there;
    values fit int32 since they are ≤ 2**total_range_bits ≤ 2**24) but with
    the margin-based overflow protection described in the module docstring.
    `bad` is True iff any row fails the host builder's validity checks —
    callers must raise rather than emit a corrupt stream.
    """
    card = pdf.shape[-1]
    total_range = 1 << total_range_bits
    alpha = min_range * card / total_range
    assert alpha <= 1, "you must reduce min_range"
    if min_range < 2:
        raise ValueError("min_range must be at least 2.")
    scale = (1 - alpha) * total_range * (1 - 1e-5)   # see module docstring
    scaled = jnp.floor(jnp.float32(scale) * pdf)
    ranges = scaled.astype(jnp.int32) + jnp.int32(min_range)
    cdf = jnp.cumsum(ranges, axis=-1)
    bad = (ranges < min_range).any() | (cdf[..., -1] > total_range).any()
    return cdf, bad


def symbol_bounds(pdf: Array, symbols: Array, total_range_bits: int = 24,
                  min_range: int = 2) -> tp.Tuple[Array, Array, Array]:
    """Per-symbol coder bounds from `[..., card]` pdfs and `[...]` symbols.

    Returns `(range_low, range_high, bad)` with the coder's convention
    `range_low = cdf[sym-1]` (0 for sym 0), `range_high = cdf[sym] - 1`
    (ref ac.py:139-146). Encode-side only — the decoder needs full rows.
    """
    cdf, bad = quantized_cdf_rows(pdf, total_range_bits, min_range)
    sym = symbols[..., None]
    high = jnp.take_along_axis(cdf, sym, axis=-1)[..., 0] - 1
    prev = jnp.take_along_axis(cdf, jnp.maximum(sym - 1, 0), axis=-1)[..., 0]
    low = jnp.where(symbols == 0, 0, prev)
    return low, high, bad
