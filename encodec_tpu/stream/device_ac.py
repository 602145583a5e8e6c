"""On-device arithmetic (range) *decoding* for the LM entropy codec.

The host range decoder (`stream.ac.ArithmeticDecoder`, bit-matching the
reference encodec/quantization/ac.py:170-260) is a sequential integer state
machine. Running it on host forces one blocking device→host CDF-row
transfer per decoded token — through a network-attached chip that is one
RTT per token, the dominant cost of LM decompression. This module runs the
*identical* state machine on device, so the whole symbol stream decodes in
a single dispatch (see `models.lm`/`stream.compress` for the fused LM+AC
scan built on top).

Exactness
---------
The coder state (`low`, `high`, `current`) can reach 2**62 (the reference
asserts `max_bit <= 61`, ac.py:141), which exceeds 32-bit integers — and
JAX's x64 mode is global and f64 is unavailable on TPU. Instead each state
word is held as two uint32 limbs, and every reference operation is
reproduced exactly with 32-bit integer arithmetic:

- doubling / bit injection: limb shift with carry;
- `effective_low = ceil(range_low * delta / 2**24)` (and the floor twin):
  the reference computes this in f64 (ac.py:188-197), which is *exact* at
  these widths (`range_low < 2**25`, `delta < 2**25`, so the product has
  < 50 significand bits < f64's 53). We compute the same product exactly
  by splitting both operands into 12/13-bit halves whose partial products
  and carries all fit int32 (< 2**27), then take the floor/ceil shift.
  Integer result == the reference's f64 result, bit for bit.
- symbol search: the reference binary-searches the CDF row (ac.py:189-205);
  on device the interval bounds for *all* symbols are computed in one
  vector op and the symbol is the largest k with `eff_low[k] <= current -
  low` (the bounds are monotone in k, so this is the same answer; a
  mismatch flag catches malformed streams instead of the reference's
  RuntimeError).

The bitstream is LSB-first within bytes (`stream.binary.BitPacker` with
bits=1, ref binary.py:55-88): bit *i* is `(data[i >> 3] >> (i & 7)) & 1`.
Reads past the end of the buffer yield 0 bits; the reference's BitUnpacker
instead reports exhaustion (ac.py:180-182), but a stream that encodes the
N symbols being decoded always contains every bit those N pulls consume,
so the two behaviors cannot diverge on any stream produced by the encoder
(callers decode exactly the encoded symbol count; roundtrip equality is
asserted by the fused decoder's re-encode verification).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray

TOTAL_RANGE_BITS = 24
_U32 = jnp.uint32
_I32 = jnp.int32


# -- two-limb u64 helpers ---------------------------------------------------
# A value v < 2**64 is (hi, lo) uint32 with v = hi * 2**32 + lo.

def _dbl(hi: Array, lo: Array, bit_in: Array) -> tp.Tuple[Array, Array]:
    """(hi, lo) * 2 + bit_in  (bit_in in {0, 1})."""
    new_hi = (hi << 1) | (lo >> 31)
    new_lo = (lo << 1) | bit_in.astype(_U32)
    return new_hi, new_lo


def _add_small(hi: Array, lo: Array, s: Array) -> tp.Tuple[Array, Array]:
    """(hi, lo) + s for 0 <= s < 2**31 (int32)."""
    su = s.astype(_U32)
    new_lo = lo + su
    carry = (new_lo < su).astype(_U32)
    return hi + carry, new_lo


def _sub_bit(hi: Array, lo: Array, b: Array, k: Array) -> tp.Tuple[Array, Array]:
    """(hi, lo) - (b << k) where bit k is known to be set when b == 1
    (the common-prefix flush only subtracts a shared set bit, ref
    ac.py:111-112 — so no borrow can propagate across limbs)."""
    kl = jnp.minimum(k, 31).astype(_U32)
    kh = jnp.minimum(jnp.maximum(k - 32, 0), 31).astype(_U32)
    in_lo = k < 32
    bu = b.astype(_U32)
    new_lo = jnp.where(in_lo, lo - (bu << kl), lo)
    new_hi = jnp.where(in_lo, hi, hi - (bu << kh))
    return new_hi, new_lo


def _get_bit(hi: Array, lo: Array, k: Array) -> Array:
    """Bit k of (hi, lo), for 0 <= k <= 63. (Also evaluated speculatively
    with k = -1 inside the flush loop's AND — clamp keeps the shift amount
    defined; the result is discarded by the short-circuiting predicate.)"""
    kl = jnp.clip(k, 0, 31).astype(_U32)
    kh = jnp.clip(k - 32, 0, 31).astype(_U32)
    return jnp.where(k < 32, (lo >> kl) & 1, (hi >> kh) & 1).astype(_U32)


def _mul_shift24(r: Array, delta: Array) -> tp.Tuple[Array, Array]:
    """Exact (floor(r * delta / 2**24), ceil(r * delta / 2**24)) for
    int32 `r`, `delta` < 2**25, matching the reference's exact-f64
    `math.floor/ceil(range * ratio)` (ac.py:132-133, 196-197).

    Split r = r1*2**12 + r0 (r1 < 2**13, r0 < 2**12) and
    delta = d1*2**13 + d0 (d1 < 2**12, d0 < 2**13); every partial product
    and carry below is < 2**27, safely inside int32.
    """
    r1, r0 = r >> 12, r & 0xFFF
    d1, d0 = delta >> 13, delta & 0x1FFF
    a = r1 * d1                     # weight 2**25
    s = r1 * d0 + 2 * (r0 * d1)     # weight 2**12; < 2**27
    d = r0 * d0                     # weight 1; < 2**25
    q, rem = s >> 12, s & 0xFFF
    t = rem * 4096 + d              # < 2**26
    floor = 2 * a + q + (t >> 24)
    frac_nonzero = (t & 0xFFFFFF) != 0
    return floor, floor + frac_nonzero.astype(_I32)


# -- decoder state ----------------------------------------------------------

def init_state(batch: tp.Optional[int] = None) -> tp.Tuple[Array, ...]:
    """Fresh decoder state: (low_hi, low_lo, high_hi, high_lo, cur_hi,
    cur_lo, max_bit, bit_pos) — scalars (or `[batch]` lanes of independent
    decoders); limbs uint32, rest int32. Mirrors
    ArithmeticDecoder.__init__ (low = high = current = 0, max_bit = -1)."""
    shape = () if batch is None else (batch,)
    z = jnp.zeros(shape, _U32)
    return (z, z, z, z, z, z, jnp.full(shape, -1, _I32),
            jnp.zeros(shape, _I32))


def _pull_bit(data: Array, pos: Array, nbits: Array) -> Array:
    """LSB-first bit `pos` of the uint8 buffer; 0 at/past bit `nbits`.

    `nbits` is the TRUE stream length in bits (may be less than
    `8 * data.shape[0]` when the buffer is padded to a bucketed shape to
    avoid per-length recompiles). Reads past `nbits` return 0 — the host
    BitUnpacker instead reports exhaustion; `ac_pull` surfaces the same
    condition through its `eof` flag (`bit_pos > nbits` after a pull)."""
    idx = jnp.clip(pos >> 3, 0, data.shape[0] - 1)
    bit = (data[idx].astype(_U32) >> (pos & 7).astype(_U32)) & 1
    return jnp.where(pos < nbits, bit, jnp.zeros((), _U32))


def ac_pull(state: tp.Tuple[Array, ...], cdf_row: Array,
            data: Array, nbits: tp.Optional[Array] = None
            ) -> tp.Tuple[tp.Tuple[Array, ...], Array, Array]:
    """Decode one symbol. `cdf_row` is the `[card]` int32 quantized CDF for
    this position (same rows the host decoder sees, `stream.device_cdf`),
    `data` the uint8 stream buffer. Returns (new_state, symbol, ok).

    Exactly `ArithmeticDecoder.pull` (ref ac.py:178-207): bit injection
    until delta >= 2**24, vectorized interval search, bound update, and
    common-prefix flush.
    """
    if nbits is None:
        nbits = jnp.asarray(8 * data.shape[0], _I32)
    lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit, pos = state

    def delta_of(l_lo: Array, h_lo: Array) -> Array:
        # high - low + 1 always fits int32 (delta <= 2**24 after any pull;
        # doubling keeps it < 2**25), so the low limbs alone carry it.
        return (h_lo - l_lo).astype(_I32) + 1

    # 1. inject bits until the range is wide enough to split (ac.py:179-186)
    def need_bits(c):
        return delta_of(c[1], c[3]) < (1 << TOTAL_RANGE_BITS)

    def inject(c):
        lh, ll, hh, hl, ch, cl, mb, p = c
        bit = _pull_bit(data, p, nbits)
        lh, ll = _dbl(lh, ll, jnp.zeros((), _U32))
        hh, hl = _dbl(hh, hl, jnp.ones((), _U32))
        ch, cl = _dbl(ch, cl, bit)
        return (lh, ll, hh, hl, ch, cl, mb + 1, p + 1)

    lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit, pos = jax.lax.while_loop(
        need_bits, inject,
        (lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit, pos))

    delta = delta_of(lo_lo, hi_lo)

    # 2. vectorized symbol search (ac.py:188-205). current - low < delta
    #    fits int32 via the low limbs (two's complement).
    cur_rel = (cu_lo - lo_lo).astype(_I32)
    prev_cdf = jnp.concatenate(
        [jnp.zeros((1,), _I32), cdf_row[:-1].astype(_I32)])
    _, eff_low = _mul_shift24(prev_cdf, delta)               # ceil
    eff_high, _ = _mul_shift24(cdf_row.astype(_I32) - 1, delta)  # floor
    sym = jnp.sum((eff_low <= cur_rel).astype(_I32)) - 1
    sym = jnp.clip(sym, 0, cdf_row.shape[0] - 1)
    sel_low = eff_low[sym]
    sel_high = eff_high[sym]
    ok = (sel_low <= cur_rel) & (cur_rel <= sel_high)

    # 3. bound update: low/high <- old_low + effective bounds (ac.py:204)
    hi_hi, hi_lo = _add_small(lo_hi, lo_lo, sel_high)
    lo_hi, lo_lo = _add_small(lo_hi, lo_lo, sel_low)

    # 4. common-prefix flush (ac.py:167-176)
    def shares_prefix(c):
        lh, ll, hh, hl, _, _, mb = c[:7]
        return (mb >= 0) & (_get_bit(lh, ll, mb) == _get_bit(hh, hl, mb))

    def flush_one(c):
        lh, ll, hh, hl, ch, cl, mb = c
        b1 = _get_bit(lh, ll, mb)
        lh, ll = _sub_bit(lh, ll, b1, mb)
        hh, hl = _sub_bit(hh, hl, b1, mb)
        ch, cl = _sub_bit(ch, cl, b1, mb)
        return (lh, ll, hh, hl, ch, cl, mb - 1)

    lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit = jax.lax.while_loop(
        shares_prefix, flush_one,
        (lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit))

    new_state = (lo_hi, lo_lo, hi_hi, hi_lo, cu_hi, cu_lo, max_bit, pos)
    return new_state, sym, ok


def ac_pull_row(state: tp.Tuple[Array, ...], rows: Array, data: Array,
                nbits: Array) -> tp.Tuple[tp.Tuple[Array, ...], Array,
                                          Array, Array]:
    """Decode one `[K, card]` row of symbols (the per-timestep codebook
    sweep of the LM codec, ref compress.py:130-148). Returns
    (state, `[K]` symbols, all-ok, eof) where `eof` mirrors the host
    BitUnpacker exhaustion (some consumed bit lay past `nbits`)."""

    def step(st, cdf_row):
        st, sym, ok = ac_pull(st, cdf_row, data, nbits)
        return st, (sym, ok)

    state, (syms, oks) = jax.lax.scan(step, state, rows)
    eof = state[7] > nbits
    return state, syms, jnp.all(oks), eof


def ac_decode_rows(data: Array, cdfs: Array) -> tp.Tuple[Array, Array]:
    """Decode `cdfs.shape[0]` symbols from the uint8 stream `data` using one
    `[N, card]` int32 CDF row per symbol, in a single scan. Returns
    (`[N]` int32 symbols, all-rows-ok flag). Jit-friendly; the building
    block for the fused LM decoder and the unit-test surface against the
    host `ArithmeticDecoder`."""

    def step(state, cdf_row):
        state, sym, ok = ac_pull(state, cdf_row, data)
        return state, (sym, ok)

    _, (syms, oks) = jax.lax.scan(step, init_state(), cdfs)
    return syms, jnp.all(oks)
