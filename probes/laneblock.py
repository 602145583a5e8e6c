"""TPU probe: time-blocked lane packing for mid-channel encoder convs.

The round-4 encode breakdown (probes/encoder.py, BENCH.md) pinned the
'high'-mode residual on MXU lane underfill: stride-1 resblock convs with
Cout in {32, 64} light only a quarter/half of the 128 output lanes, and
the ≤512-lane VPU shift dispatch (ops.conv1d_shift) deliberately excludes
them because the MXU still wins at those sizes. This probe measures a
third formulation: produce G consecutive output timesteps per MXU row by
contracting an [L·Cin] input window against a block-banded [L·Cin, G·Cout]
weight (zeros in the band padding buy full lane occupancy at a known FLOP
multiplier). Reassociates the accumulation, so it is only eligible for
the audited 'high'/'fast' serving modes — never the bit-exact HIGHEST
parity path (same contract as conv1d_shift).

Shapes: the 24 kHz encoder's real mid-channel convs at B=32 × 1 s.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

fwarm = jax.jit(lambda x: x + 1.0)
np.asarray(fwarm(jnp.zeros(())))
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(fwarm(jnp.zeros(())))
    best = min(best, time.perf_counter() - t0)
RTT = best
print(f"RTT {1e3*RTT:.1f} ms", flush=True)


def timeit_scalar(fn, *args, iters=12):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


from encodec_tpu.ops.conv import conv1d, conv1d_shift  # noqa: E402

HIGH = jax.lax.Precision.HIGH


def laneblock_weight(w, *, G, stride=1, dilation=1):
    """[K, Cin, Cout] -> block-banded [L*Cin, G*Cout] (numpy, trace-time)."""
    k, cin, cout = w.shape
    L = (G - 1) * stride + (k - 1) * dilation + 1
    blk = np.zeros((L * cin, G * cout), np.float32)
    wn = np.asarray(w, np.float32)
    for g in range(G):
        for dt in range(k):
            off = g * stride + dt * dilation
            blk[off * cin:(off + 1) * cin, g * cout:(g + 1) * cout] = wn[dt]
    return jnp.asarray(blk), L


def conv1d_laneblock(x, w_blk, *, G, L, cin, cout, stride=1):
    """x: [B, T, Cin] valid conv via G-output-per-row blocked matmul.

    NOTE: truncates the last `Tout % G` output timesteps (rows = Tout//G)
    — acceptable for this timing probe, but any promotion into
    encodec_tpu/ops must pad or special-case the tail block first."""
    B, T = x.shape[0], x.shape[1]
    Tout = (T - (L - (G - 1) * stride - 1) - 1) // stride + 1
    rows = Tout // G
    # [B, rows, L, Cin]: L strided slices, step G*stride between rows
    cols = []
    for off in range(L):
        sl = jax.lax.slice_in_dim(x, off, off + (rows - 1) * G * stride + 1,
                                  axis=1)
        cols.append(sl[:, ::G * stride, :])
    xb = jnp.stack(cols, axis=2).reshape(B, rows, L * cin)
    yb = jnp.einsum("brl,lo->bro", xb, w_blk, precision=HIGH)
    return yb.reshape(B, rows * G, cout)


B = 32
CASES = [
    # (label, T, Cin, Cout, k, stride, dilation, G to fill 128 lanes)
    ("res32 conv k3 32->16  T24000", 24000, 32, 16, 3, 1, 1, 8),
    ("res32 conv k1 16->32  T24000", 24000, 16, 32, 1, 1, 1, 4),
    ("down  conv k16 s8 32->64 T24000", 24000, 32, 64, 16, 8, 1, 2),
    ("res64 conv k3 64->32  T3000", 3000, 64, 32, 3, 1, 1, 4),
    ("res64 conv k1 32->64  T3000", 3000, 32, 64, 1, 1, 1, 2),
    ("res128 conv k3 128->64 T600", 600, 128, 64, 3, 1, 1, 2),
]

key = jax.random.PRNGKey(0)
for label, T, cin, cout, k, s, d, G in CASES:
    kx, kw, key = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, T, cin), jnp.float32)
    w = jax.random.normal(kw, (k, cin, cout), jnp.float32) / np.sqrt(k * cin)

    conv_fn = jax.jit(functools.partial(
        conv1d, stride=s, dilation=d, precision=HIGH))
    t_conv = timeit_scalar(jax.jit(lambda x, w: conv_fn(x, w).sum()), x, w)

    t_shift = float("nan")
    if s == 1 and cin * cout <= 2048:
        shift_fn = jax.jit(
            lambda x, w: conv1d_shift(x, w, dilation=d).sum())
        t_shift = timeit_scalar(shift_fn, x, w)

    w_blk, L = laneblock_weight(w, G=G, stride=s, dilation=d)
    fn = jax.jit(functools.partial(
        conv1d_laneblock, G=G, L=L, cin=cin, cout=cout, stride=s))
    # correctness vs the MXU conv (tolerance: both are 3-pass bf16
    # reassociations of the same sum)
    ref = np.asarray(conv_fn(x, w))
    Tout = ref.shape[1] - (ref.shape[1] % G)
    got = np.asarray(fn(x, w_blk))[:, :Tout]
    err = float(np.max(np.abs(got - ref[:, :Tout])) /
                max(1e-9, float(np.max(np.abs(ref)))))
    t_blk = timeit_scalar(jax.jit(lambda x, wb: fn(x, wb).sum()), x, w_blk)
    # a numerically broken formulation must not report timings as valid:
    # 1e-3 covers the 3-pass-bf16 reassociation gap with wide margin
    ok = err < 1e-3

    print(f"\n{label}")
    print(f"  lax.conv HIGH      {1e3*t_conv:7.2f} ms")
    if s == 1 and cin * cout <= 2048:
        print(f"  shift (VPU)        {1e3*t_shift:7.2f} ms")
    print(f"  laneblock G={G:<2d}     {1e3*t_blk:7.2f} ms  relerr {err:.1e}"
          f" [{'PASS' if ok else 'FAIL'}]"
          f"  ({t_conv/max(t_blk,1e-9):.2f}x vs conv)", flush=True)
    assert ok, f"laneblock relerr {err:.3e} exceeds 1e-3 on {label}"
