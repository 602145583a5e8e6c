"""Integer (fixed-point) LM inference — the machine-portable entropy prior.

Why this exists: `.ecdc` LM streams require the decoder to rebuild the
encoder's quantized CDFs EXACTLY. The float LM (`models.lm`) only
guarantees that per compiled executable — XLA float codegen differs
across executables and, far more, across platforms (CPU FMA vs TPU
bf16-pass matmuls), so an lmv=2 stream is pinned to one executable on one
platform (stream/compress.py:5-9). The reference's 1e-8 CDF roundoff
(ref encodec/quantization/ac.py:29-43) absorbs only last-ulp noise, not
cross-backend drift; no float grid can — any rounding boundary is
crossable.

The robust fix (the "integer networks" approach from learned-compression
literature): run the *entropy model* in integer arithmetic end to end.
Every op here is an exactly-defined integer op (add/mul/shift/compare/
div/gather/cumsum — HLO semantics, associative sums), so ANY platform,
ANY executable shape, ANY batching produces bit-identical CDF rows.
lmv=3 streams are therefore written on one machine and decoded on any
other, like the reference's — with a measured rate cost of well under 1%
vs the float prior (quantization noise ~2^-10 per activation against a
~0.3-logit budget for 1% rate).

Weights are derived deterministically from the float LM checkpoint
(np.rint + power-of-two scales — correctly-rounded IEEE ops, identical
on every host). Nonlinearities (exp2, sin, gelu, 1/sqrt) come from
integer LUTs built with `decimal`/`Fraction` arithmetic (pure Python —
bit-identical tables on every machine, no libm).

TPU mapping: the hot matmuls run as two int8xint8->int32 MXU dots via a
balanced base-128 activation split (`_dot_i8`); attention/score math is
int32 VPU work. The batched (teacher-forced) encode path and the
streaming decode cell are *different programs over the same integer
ops*, hence bit-identical — encode gets full chunk parallelism for free,
with no checksum/fallback protocol needed (contrast models/lm.py's
pinned-executable contract).

Bitstream contract: EVERY constant below (scales, clips, LUT contents,
shift order) defines the lmv=3 format. Changing any of them changes the
bitstream — bump ILM_VERSION and the container's "lmv" if you do.

Behavioral reference for the architecture: encodec/model.py:45-83 +
modules/transformer.py (same 5-layer windowed-causal transformer with
summed codebook embeddings, sinusoid offsets and the zero-init cache
entry quirk).
"""

from __future__ import annotations

import functools
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from .lm import LMConfig

Array = jnp.ndarray

ILM_VERSION = 3            # == the .ecdc "lmv" this module implements

ABITS = 10                 # activation fixed-point scale 2^10
ACT_MAX = 32767            # activation clip (int16 range, real +/-32)
MM_CLIP = 16319            # matmul-input clip: 2^14-65 keeps the balanced
                           # base-128 int8 split's high half within +/-127
QBITS = 7                  # q is pre-scaled to 2^7 before the k-dot
EXP_BITS = 13              # exp2 LUT output scale (values in [2^13, 2^14))
TOTAL_RANGE_BITS = 24      # matches stream.ac / the reference coder


# ---------------------------------------------------------------------------
# Deterministic LUTs (pure-Python decimal/Fraction arithmetic; identical on
# every machine — no libm involvement anywhere)
# ---------------------------------------------------------------------------

_PI_50 = "3.14159265358979323846264338327950288419716939937511"


def _decimal_ctx():
    import decimal
    ctx = decimal.Context(prec=50)
    return decimal, ctx


def _dround(decimal, v) -> int:
    return int(v.to_integral_value(rounding=decimal.ROUND_HALF_EVEN))


@functools.lru_cache()
def exp2_table() -> np.ndarray:
    """E[f] = round(2^EXP_BITS * 2^(f/1024)), f in [0, 1024).

    Built by repeated multiplication with 2^(1/1024) at 50-digit decimal
    precision — accumulated error ~1e-47, vastly inside the rounding
    cells (the values are irrational for f != 0, so no .5 ties exist)."""
    decimal, ctx = _decimal_ctx()
    step = ctx.exp(ctx.ln(decimal.Decimal(2)) / 1024)
    out = np.empty(1024, np.int32)
    v = decimal.Decimal(1 << EXP_BITS)
    for f in range(1024):
        out[f] = _dround(decimal, v)
        v = ctx.multiply(v, step)
    return out


@functools.lru_cache()
def sin_table() -> np.ndarray:
    """S[i] = round(2^14 * sin((pi/2) * i/1024)), i in [0, 1025] (the last
    entry duplicates i=1024 so interpolation at the quadrant edge is
    in-bounds). Chebyshev recurrence sin((i+1)t) = 2cos(t)sin(it) -
    sin((i-1)t) at 50-digit precision (error ~1e-46; values irrational
    except the exact endpoints — no .5 ties)."""
    decimal, ctx = _decimal_ctx()
    theta = decimal.Decimal(_PI_50) / 2048

    def _taylor(fn_sign_start, x):
        # sin: start=x, n0=1; cos: start=1, n0=0
        term, acc, n = fn_sign_start, fn_sign_start, 0
        xx = ctx.multiply(x, x)
        for k in range(40):
            n += 2
            div = n * (n + 1) if fn_sign_start == x else (n - 1) * n
            term = ctx.divide(ctx.multiply(-term, xx), decimal.Decimal(div))
            acc = ctx.add(acc, term)
        return acc

    sin1 = _taylor(theta, theta)
    cos1 = _taylor(decimal.Decimal(1), theta)
    two_cos = ctx.multiply(decimal.Decimal(2), cos1)
    scale = decimal.Decimal(1 << 14)
    out = np.empty(1026, np.int32)
    s_prev, s_cur = decimal.Decimal(0), sin1
    out[0] = 0
    for i in range(1, 1025):
        out[i] = _dround(decimal, ctx.multiply(s_cur, scale))
        s_prev, s_cur = s_cur, ctx.subtract(ctx.multiply(two_cos, s_cur),
                                            s_prev)
    out[1025] = out[1024]
    return out


@functools.lru_cache()
def gelu_table() -> np.ndarray:
    """T[i] = round(2^ABITS * gelu(-16 + i/16)), i in [0, 513] (entry 513
    duplicates 512 for in-bounds interpolation). Exact (erf-based) gelu,
    erf via a decimal Taylor series (50 digits; |x|/sqrt(2) <= 6 needs
    ~90 terms, beyond that erf == +/-1 to 1e-17 < table resolution)."""
    decimal, ctx = _decimal_ctx()
    sqrt2 = ctx.sqrt(decimal.Decimal(2))
    two_over_sqrt_pi = ctx.divide(
        decimal.Decimal(2), ctx.sqrt(decimal.Decimal(_PI_50)))

    def erf(z):
        if z < 0:
            return -erf(-z)
        if z > 6:
            return decimal.Decimal(1)
        term, acc = z, z
        zz = ctx.multiply(z, z)
        for n in range(1, 110):
            term = ctx.divide(ctx.multiply(-term, zz), decimal.Decimal(n))
            acc = ctx.add(acc, ctx.divide(term, decimal.Decimal(2 * n + 1)))
        return ctx.multiply(two_over_sqrt_pi, acc)

    out = np.empty(514, np.int32)
    half = decimal.Decimal("0.5")
    for i in range(513):
        x = decimal.Decimal(i - 256) / 16
        g = ctx.multiply(ctx.multiply(x, half),
                         ctx.add(decimal.Decimal(1),
                                 erf(ctx.divide(x, sqrt2))))
        out[i] = _dround(decimal, ctx.multiply(g, decimal.Decimal(1 << ABITS)))
    out[513] = out[512]
    return out


@functools.lru_cache()
def invsqrt_table() -> np.ndarray:
    """Y0[j] = round(2^22 / sqrt(m_j)) for m_j = (j+256)*128 + 64, covering
    m in [2^15, 2^17) with 768 cells (LUT seed; one Newton step follows
    in-graph). decimal sqrt is correctly rounded."""
    decimal, ctx = _decimal_ctx()
    out = np.empty(768, np.int32)
    num = decimal.Decimal(1 << 22)
    for j in range(768):
        m = (j + 256) * 128 + 64
        v = ctx.divide(num, ctx.sqrt(decimal.Decimal(m)))
        out[j] = int(v.to_integral_value(rounding=decimal.ROUND_HALF_EVEN))
    return out


@functools.lru_cache()
def pos_phase_steps(dim: int, max_period: float) -> np.ndarray:
    """Per-dimension phase increments: step[j] = round(2^32 /
    (2*pi*max_period^(j/(half-1)))) as uint32 — one wraparound add per
    token reproduces the reference's sinusoid arguments in *turns*
    (ref transformer.py:16-27). Python-int exact; identical everywhere."""
    decimal, ctx = _decimal_ctx()
    half = dim // 2
    two_pi = 2 * decimal.Decimal(_PI_50)
    period = decimal.Decimal(repr(max_period))
    out = np.empty(half, np.uint64)
    for j in range(half):
        p = ctx.power(period, decimal.Decimal(j) / (half - 1))
        v = ctx.divide(decimal.Decimal(1 << 32), two_pi * p)
        out[j] = int(v.to_integral_value(
            rounding=decimal.ROUND_HALF_EVEN)) & 0xFFFFFFFF
    return out.astype(np.uint32)


def layernorm_consts(d: int, eps: float = 1e-5) -> tp.Tuple[int, int]:
    """(eps in V-units, Kd = round(sqrt(d) * 2^ABITS)) — see _layernorm."""
    decimal, ctx = _decimal_ctx()
    eps_units = int((decimal.Decimal(repr(eps)) * d * (1 << 2 * ABITS))
                    .to_integral_value(rounding=decimal.ROUND_HALF_EVEN))
    kd = int((ctx.sqrt(decimal.Decimal(d)) * (1 << ABITS))
             .to_integral_value(rounding=decimal.ROUND_HALF_EVEN))
    return eps_units, kd


def qk_scale_const(head_dim: int) -> int:
    """round(2^12 / sqrt(head_dim)) — the 1/sqrt(hd) attention scale."""
    decimal, ctx = _decimal_ctx()
    v = ctx.divide(decimal.Decimal(1 << 12),
                   ctx.sqrt(decimal.Decimal(head_dim)))
    return int(v.to_integral_value(rounding=decimal.ROUND_HALF_EVEN))


LOG2E_Q14 = 23637   # round(log2(e) * 2^14); base-e -> base-2 logit convert


# ---------------------------------------------------------------------------
# Weight quantization (deterministic: IEEE rint + power-of-two scaling)
# ---------------------------------------------------------------------------

def _pow2_exponent(max_abs: float, target: int = 127, lo: int = -8,
                   hi: int = 20) -> int:
    """Largest e in [lo, hi] with max_abs * 2^e <= target, via exact
    power-of-two float multiplies (no log — libm-free, deterministic)."""
    if max_abs == 0.0 or not np.isfinite(max_abs):
        return 0
    e = hi
    while e > lo and float(max_abs) * float(2.0 ** e) > target:
        e -= 1
    return e


def _qmat(w: np.ndarray) -> tp.Tuple[np.ndarray, int]:
    """float weights -> (int8 quantized, power-of-two exponent e):
    w_q = rint(w * 2^e), |w_q| <= 127."""
    w = np.asarray(w, np.float64)
    e = _pow2_exponent(float(np.max(np.abs(w))) if w.size else 0.0)
    q = np.clip(np.rint(w * (2.0 ** e)), -127, 127).astype(np.int8)
    return q, e


def _qvec(v: np.ndarray, bits: int = ABITS,
          clip: int = 2 ** 30) -> np.ndarray:
    return np.clip(np.rint(np.asarray(v, np.float64) * (1 << bits)),
                   -clip, clip).astype(np.int32)


def quantize_lm_params(params: dict, cfg: LMConfig
                       ) -> tp.Tuple[dict, tuple]:
    """Float LM pytree (models.lm layout) -> (integer param pytree,
    static per-matrix exponent tuple). Deterministic on any host."""
    g = lambda x: np.asarray(x)  # noqa: E731 — device->host once

    iparams: dict = {
        "emb": np.clip(np.rint(g(params["emb"]).astype(np.float64)
                               * (1 << ABITS)),
                       -ACT_MAX, ACT_MAX).astype(np.int16),
        "norm_in": {
            # |scale| capped at 8 so n*scale stays in int32 (see _layernorm)
            "scale": _qvec(g(params["norm_in"]["scale"]), clip=8 << ABITS),
            "bias": _qvec(g(params["norm_in"]["bias"]), clip=ACT_MAX),
        },
        "layers": [],
    }
    head_q, head_e = _qmat(g(params["linears"]["w"]))
    iparams["head_w"] = head_q
    iparams["head_b"] = _qvec(g(params["linears"]["b"]))
    exps = [head_e]
    for layer in params["layers"]:
        il = {}
        for name in ("q", "k", "v", "out", "ff1", "ff2"):
            wq, e = _qmat(g(layer[name]["w"]))
            il[name] = {"w": wq, "b": _qvec(g(layer[name]["b"]))}
            exps.append(e)
        for nm in ("norm1", "norm2"):
            il[nm] = {"scale": _qvec(g(layer[nm]["scale"]), clip=8 << ABITS),
                      "bias": _qvec(g(layer[nm]["bias"]), clip=ACT_MAX)}
        iparams["layers"].append(il)
    # LUTs ride in the pytree (constant int arrays, same on every host)
    iparams["lut"] = {
        "exp2": exp2_table(), "sin": sin_table(), "gelu": gelu_table(),
        "invsqrt": invsqrt_table(),
        "pos_step": pos_phase_steps(cfg.dim, cfg.max_period),
    }
    return iparams, tuple(exps)


# ---------------------------------------------------------------------------
# Integer numerics helpers (all int32/uint32; no 64-bit types — TPU-safe)
# ---------------------------------------------------------------------------

def _rshift_round(x: Array, s: int) -> Array:
    """Round-half-up arithmetic right shift (s static >= 0)."""
    if s <= 0:
        return x << (-s)
    return (x + (1 << (s - 1))) >> s


def _dot_i8(a: Array, w8: Array) -> Array:
    """Exact integer matmul a[..., n] @ w8[n, m] -> int32, via a balanced
    base-128 split of the (pre-clipped, |a| <= MM_CLIP) activations into
    two int8 halves — both dots are MXU-eligible int8xint8->int32.

    acc bound: n <= 800 terms of |a*w| <= 16319*127 => |acc| < 2^31."""
    lo = ((a + 64) & 127) - 64             # in [-64, 63]
    hi = (a - lo) >> 7                     # |hi| <= 127 by the MM_CLIP bound
    cd = ((a.ndim - 1,), (0,)), ((), ())
    d_lo = jax.lax.dot_general(lo.astype(jnp.int8), w8, cd,
                               preferred_element_type=jnp.int32)
    d_hi = jax.lax.dot_general(hi.astype(jnp.int8), w8, cd,
                               preferred_element_type=jnp.int32)
    return (d_hi << 7) + d_lo


def _linear(x: Array, layer: dict, e: int) -> Array:
    """A10 activations -> A10 output: clip, int8 matmul, rescale, bias."""
    x = jnp.clip(x, -MM_CLIP, MM_CLIP)
    acc = _dot_i8(x, layer["w"])
    return _rshift_round(acc, e) + layer["b"]


def _mul32(a: Array, b: Array) -> tp.Tuple[Array, Array]:
    """Exact unsigned 32x32 -> 64 product as (hi, lo) uint32 limbs.
    Inputs int32/uint32 interpreted unsigned (callers pass non-negative)."""
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    a1, a0 = au >> 16, au & 0xFFFF
    b1, b0 = bu >> 16, bu & 0xFFFF
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl                                   # may wrap
    mid_carry = (mid < lh).astype(jnp.uint32) << 16
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + mid_carry + lo_carry
    return hi, lo


def _shr64(hi: Array, lo: Array, s: Array) -> Array:
    """(hi, lo) >> s -> uint32 (caller guarantees the result fits 32 bits).
    s is a traced int32 in [0, 63]."""
    s = s.astype(jnp.uint32)
    lo_part = jnp.where(s < 32, lo >> jnp.minimum(s, 31), 0)
    hi_in = jnp.where((s > 0) & (s < 32),
                      hi << jnp.clip(32 - s.astype(jnp.int32), 0, 31)
                      .astype(jnp.uint32), 0)
    hi_part = jnp.where(s >= 32, hi >> jnp.minimum(s - 32, 31), hi_in)
    return jnp.where(s == 0, lo, lo_part | hi_part)


def _bitlen(x: Array) -> Array:
    """Bit length of a non-negative int32 (0 -> 0), branchless."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros_like(x, jnp.int32)
    for k in (16, 8, 4, 2, 1):
        big = x >= (jnp.uint32(1) << k)
        n = n + jnp.where(big, k, 0)
        x = jnp.where(big, x >> k, x)
    return n + (x > 0).astype(jnp.int32)


def _layernorm(x: Array, scale_q: Array, bias_q: Array, d: int,
               lut_invsqrt: Array, eps_units: int, kd: int) -> Array:
    """Integer LayerNorm over the last axis (A10 in/out).

    Exact variance via 16-bit limb accumulation; 1/sqrt via LUT seed + one
    integer Newton step (rel err ~2^-16, far inside the rate-noise budget).
    """
    x = jnp.clip(x, -ACT_MAX, ACT_MAX)
    s = jnp.sum(x, axis=-1, keepdims=True)
    half = d // 2
    mu = (s + jnp.where(s >= 0, half, -half)) // d    # round-to-nearest
    c = jnp.clip(x - mu, -32768, 32767)
    c2 = c * c                                        # <= 2^30
    shi = jnp.sum(c2 >> 16, axis=-1, keepdims=True)
    slo = jnp.sum(c2 & 0xFFFF, axis=-1, keepdims=True)
    vlo = slo + eps_units
    shi = shi + (vlo >> 16)
    vlo = vlo & 0xFFFF                                # V = shi*2^16 + vlo
    eb = jnp.where(shi > 0, 16 + _bitlen(shi), _bitlen(vlo)) - 1
    h = (eb - 15) >> 1                                # floor; may be negative
    sh2 = 2 * h
    # m = V >> sh2 (or << -sh2), in [2^15, 2^17)
    v_small = (shi << 16) | vlo                       # exact when shi < 2^15
    m = jnp.where(
        sh2 >= 16, shi >> jnp.clip(sh2 - 16, 0, 31),
        jnp.where(sh2 >= 0,
                  (shi << jnp.clip(16 - sh2, 0, 31))
                  | (vlo >> jnp.clip(sh2, 0, 31)),
                  v_small << jnp.clip(-sh2, 0, 31)))
    idx = jnp.clip((m >> 7) - 256, 0, 767)
    y0 = lut_invsqrt[idx]                             # ~2^22 / sqrt(m)
    # Newton: y1 = y0 * (3*2^14 - (m*y0^2 >> 30)) >> 15
    y0sq = y0 * y0                                    # <= 2^29
    qhi, qlo = _mul32(m, y0sq)
    qq = _shr64(qhi, qlo, jnp.full_like(m, 30)).astype(jnp.int32)
    y1 = (y0 * ((3 << 14) - qq)) >> 15
    # n = c * y1 * Kd >> (22 + h)   (A10 normalized value)
    cy = c * y1                                       # |c|<=2^15, y1<2^15
    sgn = jnp.sign(cy)
    nhi, nlo = _mul32(jnp.abs(cy), jnp.full_like(cy, kd))
    shift = jnp.clip(22 + h, 0, 63).astype(jnp.int32)
    n = sgn * _shr64(nhi, nlo, jnp.broadcast_to(shift, cy.shape)
                     ).astype(jnp.int32)
    n = jnp.clip(n, -ACT_MAX, ACT_MAX)
    out = _rshift_round(n * scale_q, ABITS) + bias_q
    return jnp.clip(out, -ACT_MAX, ACT_MAX)


def _exp2_fixed(t: Array, lut: Array) -> Array:
    """2^(t/2^ABITS) at scale 2^EXP_BITS for t <= 0 (A10 base-2 log
    domain). Saturates to 0 below ~-31 integer bits.

    With u = -t = q*1024 + r:  2^(-u/1024) = LUT[0] >> q when r == 0,
    else LUT[1024-r] >> (q+1)."""
    u = jnp.minimum(-t, 31 << ABITS)
    q = u >> ABITS
    r = u & ((1 << ABITS) - 1)
    f = ((1 << ABITS) - r) & ((1 << ABITS) - 1)
    shift = q + (r != 0).astype(jnp.int32)
    return lut[f] >> jnp.minimum(shift, 31).astype(jnp.uint32)


def _to_base2(logits: Array) -> Array:
    """A10 natural-log-domain logit deltas (<= 0) -> A10 base-2."""
    # |logits| <= 64<<10 (callers clip); * LOG2E_Q14 <= 2^31 - safe margin
    return _rshift_round(logits * LOG2E_Q14 >> 7, 7)


def _gelu_int(x: Array, lut: Array) -> Array:
    """A10 gelu via 512-cell LUT + linear interpolation."""
    xc = jnp.clip(x, -(16 << ABITS), (16 << ABITS) - 1)
    u = xc + (16 << ABITS)
    idx = u >> 6
    frac = u & 63
    t0 = lut[idx]
    t1 = lut[idx + 1]
    return t0 + (((t1 - t0) * frac) >> 6)


def _sin_from_phase(phase: Array, lut: Array) -> Array:
    """sin(2*pi*phase/2^32) at A10, via quarter-wave LUT + interpolation."""
    quad = (phase >> 30).astype(jnp.int32)            # 0..3
    p20 = ((phase >> 10) & 0xFFFFF).astype(jnp.int32)  # pos within quadrant
    mirrored = jnp.where((quad & 1) == 1, (1 << 20) - p20, p20)
    idx = mirrored >> 10                              # 0..1024
    frac = mirrored & 1023
    s0 = lut[idx]
    s1 = lut[idx + 1]
    v = s0 + (((s1 - s0) * frac) >> 10)               # scale 2^14
    v = jnp.where(quad >= 2, -v, v)
    return _rshift_round(v, 4)                        # -> A10


def _pos_embedding(phase: Array, lut_sin: Array) -> Array:
    """uint32 phase[half] -> A10 [dim] (cos half then sin half, matching
    ref transformer.py:16-27 / models.lm.sin_embedding layout)."""
    cos = _sin_from_phase(phase + jnp.uint32(1 << 30), lut_sin)
    sin = _sin_from_phase(phase, lut_sin)
    return jnp.concatenate([cos, sin], axis=-1)


# ---------------------------------------------------------------------------
# CDF head (the lmv=3 bitstream definition)
# ---------------------------------------------------------------------------

def scores_to_cdf(scores: Array) -> Array:
    """Integer exp-scores [..., card] -> int32 quantized CDF rows.

    With M = 2^24 - 2*card (the distributable range mass after the
    min_range=2 floor): ranges_i = 2 + (floor(e_i * 2^16 / sum(e)) *
    (M >> 10)) >> 6, cdf = cumsum. By construction every range >=
    min_range=2 and cdf[-1] <= 2^24 (sum of the p16 floors <= 2^16, and
    sum of the scaled floors <= M) — the coder's validity checks can
    never fire."""
    card = scores.shape[-1]
    m = (1 << TOTAL_RANGE_BITS) - 2 * card
    total = jnp.sum(scores, axis=-1, keepdims=True)   # <= card * 2^14
    p16 = (scores << 16) // jnp.maximum(total, 1)
    ranges = 2 + ((p16 * (m >> 10)) >> 6)
    return jnp.cumsum(ranges, axis=-1)


def int_symbol_bounds(cdf: Array, symbols: Array
                      ) -> tp.Tuple[Array, Array]:
    """(cdf [..., card], symbols [...]) -> coder (range_low, range_high),
    the `push_bounds` convention (ref ac.py:139-146)."""
    sym = symbols[..., None]
    high = jnp.take_along_axis(cdf, sym, axis=-1)[..., 0] - 1
    prev = jnp.take_along_axis(cdf, jnp.maximum(sym - 1, 0), axis=-1)[..., 0]
    low = jnp.where(symbols == 0, 0, prev)
    return low, high


# ---------------------------------------------------------------------------
# The integer transformer
# ---------------------------------------------------------------------------

class ILMStreamState(tp.NamedTuple):
    kcache: Array   # [L, B, W, C] int16 — cached K projections, newest last
    vcache: Array   # [L, B, W, C] int16 — cached V projections
    length: Array   # [] int32 (includes the zero-init entry, ref quirk)
    phase: Array    # [half] uint32 — positional phase accumulators


def _exps_of(exps: tuple, li: int) -> dict:
    """Static exponents for layer li: head is exps[0], then 6 per layer."""
    names = ("q", "k", "v", "out", "ff1", "ff2")
    base = 1 + 6 * li
    return {n: exps[base + i] for i, n in enumerate(names)}


def _zero_entry_kv(layer: dict, e: dict) -> tp.Tuple[Array, Array]:
    """k/v of the reference's zero-init cache entry: projection of a zero
    input = the (rescaled) bias alone."""
    k0 = jnp.clip(layer["k"]["b"], -MM_CLIP, MM_CLIP).astype(jnp.int16)
    v0 = jnp.clip(layer["v"]["b"], -MM_CLIP, MM_CLIP).astype(jnp.int16)
    return k0, v0


def init_ilm_stream(iparams: dict, exps: tuple, cfg: LMConfig,
                    batch: int = 1, offset: int = 0) -> ILMStreamState:
    """Fresh stream state. The ring's newest slot holds the zero-entry's
    k/v (bias projections), mirroring ref transformer.py:106's zero
    cache entry; `offset` initializes the positional phase EXACTLY as
    `offset` wraparound additions would (python-int modular arithmetic)."""
    W = cfg.past_context
    L = cfg.num_layers
    d = cfg.dim
    kc = np.zeros((L, batch, W, d), np.int16)
    vc = np.zeros((L, batch, W, d), np.int16)
    steps = pos_phase_steps(cfg.dim, cfg.max_period)
    phase = ((int(offset) * steps.astype(np.uint64)) % (1 << 32)).astype(
        np.uint32)
    state = ILMStreamState(
        kcache=jnp.asarray(kc), vcache=jnp.asarray(vc),
        length=jnp.asarray(1, jnp.int32), phase=jnp.asarray(phase))
    # fill the newest slot with the zero-entry projections per layer
    kcs, vcs = [], []
    for li, layer in enumerate(iparams["layers"]):
        k0, v0 = _zero_entry_kv(layer, _exps_of(exps, li))
        kcs.append(jnp.broadcast_to(k0.astype(jnp.int16), (batch, 1, d)))
        vcs.append(jnp.broadcast_to(v0.astype(jnp.int16), (batch, 1, d)))
    kc2 = state.kcache.at[:, :, W - 1:].set(jnp.stack(kcs))
    vc2 = state.vcache.at[:, :, W - 1:].set(jnp.stack(vcs))
    return state._replace(kcache=kc2, vcache=vc2)


def _trunk_in(iparams: dict, indices: Array, phase: Array,
              cfg: LMConfig, eps_kd: tp.Tuple[int, int]) -> Array:
    """Summed codebook embeddings -> norm_in -> + positional (A10).
    indices [..., K] (1 + previous code, 0 = start)."""
    K = indices.shape[-1]
    emb = iparams["emb"][:K]                       # [K, card+1, d] int16
    gathered = jax.vmap(lambda e, i: e[i], in_axes=(0, -1), out_axes=-2)(
        emb, indices)                              # [..., K, d]
    x = jnp.sum(gathered.astype(jnp.int32), axis=-2)
    eps_units, kd = eps_kd
    x = _layernorm(x, iparams["norm_in"]["scale"], iparams["norm_in"]["bias"],
                   cfg.dim, iparams["lut"]["invsqrt"], eps_units, kd)
    pe = _pos_embedding(phase, iparams["lut"]["sin"])
    return jnp.clip(x + pe, -ACT_MAX, ACT_MAX)


def _attention_out(a: Array, v: Array) -> Array:
    """a [B,H,T,S] (2^12-scaled weights), v [B,S,H,hd] -> A10 [B,T,H*hd]."""
    out = jnp.einsum("bhts,bshd->bthd", a, v.astype(jnp.int32))
    B, T = out.shape[0], out.shape[1]
    return _rshift_round(out.reshape(B, T, -1), 12)


def _softmax_weights(logits: Array, mask: Array, lut_exp2: Array) -> Array:
    """Masked integer softmax -> 2^12-scaled weights (exact division)."""
    NEG = jnp.int32(-(1 << 30))
    lm = jnp.where(mask, logits, NEG)
    mx = jnp.max(lm, axis=-1, keepdims=True)
    t = jnp.clip(lm - mx, -(63 << ABITS), 0)
    t2 = _to_base2(t)
    e = jnp.where(mask, _exp2_fixed(t2, lut_exp2), 0)
    tot = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1)
    return (e << 12) // tot


def ilm_step(iparams: dict, exps: tuple, indices: Array,
             state: ILMStreamState, cfg: LMConfig
             ) -> tp.Tuple[Array, ILMStreamState]:
    """One streaming step: indices [B, K] -> (cdf rows [B, K, card] int32,
    new state). The decompression cell — bit-identical to the batched
    teacher-forced path because every op is exact integer arithmetic."""
    B, K = indices.shape
    W = cfg.past_context
    H = cfg.num_heads
    d = cfg.dim
    hd = d // H
    eps_kd = layernorm_consts(d)
    lut = iparams["lut"]
    ks = qk_scale_const(hd)

    x = _trunk_in(iparams, indices, state.phase, cfg, eps_kd)  # [B, d]
    x = x[:, None]                                             # [B, 1, d]

    n_valid = jnp.minimum(state.length, W)
    slot_valid = jnp.arange(W) >= (W - n_valid)                # [W]

    new_k, new_v = [], []
    for li, layer in enumerate(iparams["layers"]):
        e = _exps_of(exps, li)
        q = _linear(x, layer["q"], e["q"])
        k_new = jnp.clip(_linear(x, layer["k"], e["k"]), -MM_CLIP, MM_CLIP)
        v_new = jnp.clip(_linear(x, layer["v"], e["v"]), -MM_CLIP, MM_CLIP)
        kc = state.kcache[li].astype(jnp.int32)                # [B, W, d]
        vc = state.vcache[li].astype(jnp.int32)
        keys = jnp.concatenate([kc, k_new], axis=1)            # [B, W+1, d]
        vals = jnp.concatenate([vc, v_new], axis=1)
        q7 = jnp.clip(_rshift_round(q, ABITS - QBITS), -2047, 2047)
        qh = q7.reshape(B, 1, H, hd)
        kh = keys.reshape(B, W + 1, H, hd)
        logits = jnp.einsum("bthd,bshd->bhts", qh, kh)         # 2^17 scale
        l10 = jnp.clip(_rshift_round(logits, 7), -65535, 65535)
        l10 = jnp.clip((l10 * ks) >> 12, -(63 << ABITS), (63 << ABITS))
        mask = jnp.concatenate([slot_valid, jnp.ones((1,), bool)])
        a = _softmax_weights(l10, mask[None, None, None, :], lut["exp2"])
        attn = _attention_out(a, vals.reshape(B, W + 1, H, hd))
        o = _linear(attn, layer["out"], e["out"])
        x1 = _layernorm(x + o, layer["norm1"]["scale"],
                        layer["norm1"]["bias"], d, lut["invsqrt"], *eps_kd)
        ff = _linear(_gelu_int(_linear(x1, layer["ff1"], e["ff1"]),
                               lut["gelu"]), layer["ff2"], e["ff2"])
        x = _layernorm(x1 + ff, layer["norm2"]["scale"],
                       layer["norm2"]["bias"], d, lut["invsqrt"], *eps_kd)
        new_k.append(jnp.concatenate(
            [state.kcache[li][:, 1:], k_new.astype(jnp.int16)], axis=1))
        new_v.append(jnp.concatenate(
            [state.vcache[li][:, 1:], v_new.astype(jnp.int16)], axis=1))

    cdf = _head_cdf(iparams, exps, x[:, 0], K)                 # [B, K, card]
    new_state = ILMStreamState(
        kcache=jnp.stack(new_k), vcache=jnp.stack(new_v),
        length=jnp.minimum(state.length + 1, W + 1),
        phase=state.phase + lut["pos_step"])
    return cdf, new_state


def _head_cdf(iparams: dict, exps: tuple, x: Array, K: int) -> Array:
    """Trunk output [..., d] -> CDF rows [..., K, card]."""
    xc = jnp.clip(x, -MM_CLIP, MM_CLIP)
    lo = ((xc + 64) & 127) - 64
    hi = (xc - lo) >> 7
    w = iparams["head_w"][:K]                                  # [K, d, card]
    acc = (jnp.einsum("...d,kdn->...kn", hi.astype(jnp.int8), w,
                      preferred_element_type=jnp.int32) << 7) \
        + jnp.einsum("...d,kdn->...kn", lo.astype(jnp.int8), w,
                     preferred_element_type=jnp.int32)
    logits = _rshift_round(acc, exps[0]) + iparams["head_b"][:K]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    t = jnp.clip(logits - mx, -(63 << ABITS), 0)
    scores = _exp2_fixed(_to_base2(t), iparams["lut"]["exp2"])
    return scores_to_cdf(scores)


# ---------------------------------------------------------------------------
# Batched teacher-forced forward (the encode path) — bit-identical to
# scanning ilm_step, but parallel over the chunk (one big masked attention)
# ---------------------------------------------------------------------------

class ILMChunkCarry(tp.NamedTuple):
    kcache: Array   # [L, B, W, C] int16
    vcache: Array   # [L, B, W, C] int16
    length: Array   # [] int32
    phase: Array    # [half] uint32 — phase of the NEXT token


def carry_from_state(state: ILMStreamState) -> ILMChunkCarry:
    return ILMChunkCarry(state.kcache, state.vcache, state.length,
                         state.phase)


def ilm_chunk_forward(iparams: dict, exps: tuple, indices: Array,
                      carry: ILMChunkCarry, cfg: LMConfig
                      ) -> tp.Tuple[Array, ILMChunkCarry]:
    """Teacher-forced chunk: indices [B, K, C] -> (cdf rows [B, C, K, card],
    new carry). Windowed attention over [cache(W) | chunk(C)] keys with the
    exact mask the streaming cell induces:
      in-chunk key s for query t:  0 <= t - s <= W
      cache slot j for query t:    j >= max(t, W - min(length, W))
    (derivation mirrors models.lm.lm_prologue's kpos/qpos window with the
    zero-entry column; the zero entry lives in the ring, placed by
    init_ilm_stream)."""
    B, K, C = indices.shape
    W = cfg.past_context
    H = cfg.num_heads
    d = cfg.dim
    hd = d // H
    eps_kd = layernorm_consts(d)
    lut = iparams["lut"]
    ks = qk_scale_const(hd)

    # per-position phases: phase_t = phase0 + t*step (wraparound exact)
    tpos = jnp.arange(C, dtype=jnp.uint32)[:, None]
    phases = carry.phase[None, :] + tpos * lut["pos_step"][None, :]
    idx_t = jnp.moveaxis(indices, -1, 1)                       # [B, C, K]
    x = _trunk_in(iparams, idx_t, phases[None], cfg, eps_kd)   # [B, C, d]

    n_valid = jnp.minimum(carry.length, W)
    t_ar = jnp.arange(C)[:, None]
    cache_mask = (jnp.arange(W)[None, :] >= jnp.maximum(
        t_ar, W - n_valid))                                    # [C, W]
    s_ar = jnp.arange(C)[None, :]
    chunk_mask = (t_ar - s_ar >= 0) & (t_ar - s_ar <= W)       # [C, C]
    mask = jnp.concatenate([cache_mask, chunk_mask], axis=1)   # [C, W+C]

    new_k, new_v = [], []
    for li, layer in enumerate(iparams["layers"]):
        e = _exps_of(exps, li)
        q = _linear(x, layer["q"], e["q"])
        k_new = jnp.clip(_linear(x, layer["k"], e["k"]), -MM_CLIP, MM_CLIP)
        v_new = jnp.clip(_linear(x, layer["v"], e["v"]), -MM_CLIP, MM_CLIP)
        keys = jnp.concatenate(
            [carry.kcache[li].astype(jnp.int32), k_new], axis=1)
        vals = jnp.concatenate(
            [carry.vcache[li].astype(jnp.int32), v_new], axis=1)
        q7 = jnp.clip(_rshift_round(q, ABITS - QBITS), -2047, 2047)
        qh = q7.reshape(B, C, H, hd)
        kh = keys.reshape(B, W + C, H, hd)
        logits = jnp.einsum("bthd,bshd->bhts", qh, kh)
        l10 = jnp.clip(_rshift_round(logits, 7), -65535, 65535)
        l10 = jnp.clip((l10 * ks) >> 12, -(63 << ABITS), (63 << ABITS))
        a = _softmax_weights(l10, mask[None, None], lut["exp2"])
        attn = _attention_out(a, vals.reshape(B, W + C, H, hd))
        o = _linear(attn, layer["out"], e["out"])
        x1 = _layernorm(x + o, layer["norm1"]["scale"],
                        layer["norm1"]["bias"], d, lut["invsqrt"], *eps_kd)
        ff = _linear(_gelu_int(_linear(x1, layer["ff1"], e["ff1"]),
                               lut["gelu"]), layer["ff2"], e["ff2"])
        x = _layernorm(x1 + ff, layer["norm2"]["scale"],
                       layer["norm2"]["bias"], d, lut["invsqrt"], *eps_kd)
        ring = jnp.concatenate(
            [carry.kcache[li], k_new.astype(jnp.int16)], axis=1)[:, -W:]
        new_k.append(ring)
        new_v.append(jnp.concatenate(
            [carry.vcache[li], v_new.astype(jnp.int16)], axis=1)[:, -W:])

    cdf = _head_cdf(iparams, exps, x, K)                   # [B, C, K, card]
    new_carry = ILMChunkCarry(
        kcache=jnp.stack(new_k), vcache=jnp.stack(new_v),
        length=jnp.minimum(carry.length + C, W + 1),
        phase=carry.phase + jnp.uint32(C) * lut["pos_step"])
    return cdf, new_carry


# ---------------------------------------------------------------------------
# Model wrapper (the lmv=3 codec surface consumed by stream.compress)
# ---------------------------------------------------------------------------

class IntLMModel:
    """Integer LM bundled with its jitted codec paths.

    Derive from a float `LMModel` via `from_lm` (deterministic on any
    host); the derived integer parameters — not the float ones — define
    the lmv=3 bitstream."""

    CODEC_CHUNK = 256

    def __init__(self, cfg: LMConfig, iparams: dict, exps: tuple):
        self.cfg = cfg
        self.iparams = jax.tree.map(jnp.asarray, iparams)
        self.exps = exps
        self._jit: dict = {}

    @classmethod
    def from_lm(cls, lm) -> "IntLMModel":
        cached = getattr(lm, "_int_model", None)
        if cached is not None:
            return cached
        iparams, exps = quantize_lm_params(lm.params, lm.cfg)
        m = cls(lm.cfg, iparams, exps)
        lm._int_model = m
        return m

    @property
    def card(self) -> int:
        return self.cfg.card

    def init_stream(self, batch: int = 1, offset: int = 0) -> ILMStreamState:
        return init_ilm_stream(self.iparams, self.exps, self.cfg,
                               batch=batch, offset=offset)

    def chunk_exec(self, batch: int, K: int, chunk: int):
        """Jitted teacher-forced chunk: (iparams, indices [B,K,C], carry)
        -> (cdf rows [B,C,K,card], carry)."""
        key = ("chunk", batch, K, chunk)
        if key not in self._jit:
            cfg, exps = self.cfg, self.exps
            self._jit[key] = jax.jit(
                lambda p, i, c: ilm_chunk_forward(p, exps, i, c, cfg))
        return self._jit[key]

    def bounds_exec(self):
        """(cdf [B,C,K,card], symbols [B,K,C]) -> ([B,C,K] lows, highs)."""
        if "bounds" not in self._jit:
            def bounds(cdf, symbols):
                return int_symbol_bounds(cdf,
                                         jnp.transpose(symbols, (0, 2, 1)))
            self._jit["bounds"] = jax.jit(bounds)
        return self._jit["bounds"]

    def codec_symbol_bounds(self, codes: np.ndarray,
                            chunk: tp.Optional[int] = None):
        """[K, T] codes -> (lows, highs) int64 [T*K] in (t, k) interleave
        order — same surface as LMModel.codec_symbol_bounds."""
        return self.codec_symbol_bounds_batched([codes], chunk)[0]

    def codec_symbol_bounds_batched(self, codes_list, chunk=None):
        """Lockstep bounds for S independent frames (fresh state each) —
        same surface as LMModel.codec_symbol_bounds_batched."""
        if chunk is None:
            chunk = self.CODEC_CHUNK
        S = len(codes_list)
        K = codes_list[0].shape[0]
        Ts = [c.shape[1] for c in codes_list]
        T_max = max(Ts)
        n_chunks = max(1, -(-T_max // chunk))
        Tp = n_chunks * chunk
        shifted = np.zeros((S, K, Tp), np.int32)
        symbols = np.zeros((S, K, Tp), np.int32)
        for s, c in enumerate(codes_list):
            shifted[s, :, 1:Ts[s]] = 1 + c[:, :Ts[s] - 1]
            symbols[s, :, :Ts[s]] = c
        exec_ = self.chunk_exec(S, K, chunk)
        bounds_ = self.bounds_exec()
        carry = carry_from_state(self.init_stream(batch=S))
        outs = []
        for ci in range(n_chunks):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            cdf, carry = exec_(self.iparams, jnp.asarray(shifted[:, :, sl]),
                               carry)
            outs.append(bounds_(cdf, jnp.asarray(symbols[:, :, sl])))
        lows = np.concatenate([np.asarray(o[0]) for o in outs], axis=1)
        highs = np.concatenate([np.asarray(o[1]) for o in outs], axis=1)
        return [(lows[s, :Ts[s]].reshape(-1).astype(np.int64),
                 highs[s, :Ts[s]].reshape(-1).astype(np.int64))
                for s in range(S)]

    def fused_decode_chunk_exec(self):
        """Single-dispatch integer LM + range decode of one CODEC_CHUNK.

        Same lockstep signature as LMModel.fused_decode_chunk_exec minus
        the checksum outputs: `(iparams, state, ac_state, data u8[S,N],
        nbits [S], prev_row [S,K], ts [S], t0) -> (syms [C,S,K], ok [C],
        eof [C], state, ac_state, prev_row)`. No verification protocol:
        integer arithmetic makes ANY executable reproduce the encoder's
        CDF rows exactly; end-to-end integrity is covered by the
        container's code checksum ("cc")."""
        if "fused_decode" not in self._jit:
            from ..stream import device_ac
            cfg, exps = self.cfg, self.exps
            chunk = self.CODEC_CHUNK

            def run_chunk(iparams, state, ac_state, data, nbits, prev_row,
                          ts, t0):
                pull = jax.vmap(device_ac.ac_pull_row, in_axes=(0, 0, 0, 0))

                def body(carry, t_abs):
                    st, ac, prev = carry
                    rows, st = ilm_step(iparams, exps, prev, st, cfg)
                    ac_new, syms, ok, eof = pull(ac, rows, data, nbits)
                    active = t_abs < ts
                    ac = jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        ac_new, ac)
                    syms = jnp.where(active[:, None], syms, 0)
                    feed = (t_abs + 1) < ts
                    nxt = jnp.where(feed[:, None],
                                    (1 + syms).astype(jnp.int32), 0)
                    ok = jnp.all(ok | ~active)
                    eof = jnp.any(eof & active)
                    return (st, ac, nxt), (syms, ok, eof)

                (state, ac_state, prev_row), outs = jax.lax.scan(
                    body, (state, ac_state, prev_row),
                    t0 + jnp.arange(chunk, dtype=jnp.int32))
                syms, ok, eof = outs
                return syms, ok, eof, state, ac_state, prev_row

            self._jit["fused_decode"] = jax.jit(run_chunk)
        return self._jit["fused_decode"]


def codes_checksum(frames_codes: tp.Iterable[np.ndarray]) -> int:
    """CRC32 over frames' [K, T] codes in write order (little-endian u16)
    — the lmv=3 end-to-end integrity field ("cc")."""
    import zlib
    crc = 0
    for codes in frames_codes:
        buf = np.ascontiguousarray(np.asarray(codes), dtype="<u2").tobytes()
        crc = zlib.crc32(buf, crc)
    return crc & 0xFFFFFFFF
