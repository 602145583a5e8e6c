"""TPU probe: small-channel conv1d formulations (decoder tail hot spot).

The 24 kHz decoder's final conv (Cin=32, Cout=1, k=7, T=24000, B=32) costs
~10 ms at HIGHEST via lax.conv — the MXU wastes 127/128 lanes on Cout=1
and pays 6-pass bf16 emulation. Candidates:
  a) lax.conv (baseline, HIGHEST / HIGH)
  b) shifted-slice multiply-sum (VPU, true f32, no emulation)
  c) per-tap matmul sum (k small matmuls)
Also measures the up2-stage resblock conv (32ch) and the encoder init conv
(1->32) under the same treatments.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

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


from encodec_tpu.ops.conv import conv1d


def conv_shift(x, w, *, dilation=1):
    """Shifted-slice multiply-sum: VPU path, true f32 accumulation."""
    k, cin, cout = w.shape
    T = x.shape[1] - (k - 1) * dilation
    acc = jnp.zeros((x.shape[0], T, cout), x.dtype)
    for dt in range(k):
        sl = jax.lax.dynamic_slice_in_dim(x, dt * dilation, T, axis=1)
        # [B,T,Cin] x [Cin,Cout] — einsum so XLA may still pick dot;
        # for cout==1 use an explicit broadcast-reduce instead
        if cout == 1:
            acc = acc + (sl * w[dt, :, 0]).sum(-1, keepdims=True)
        else:
            acc = acc + jnp.einsum(
                "btc,cd->btd", sl, w[dt],
                precision=jax.lax.Precision.HIGHEST)
    return acc


def conv_tapmm(x, w, *, dilation=1, precision=jax.lax.Precision.HIGHEST):
    k, cin, cout = w.shape
    T = x.shape[1] - (k - 1) * dilation
    acc = jnp.zeros((x.shape[0], T, cout), x.dtype)
    for dt in range(k):
        sl = jax.lax.dynamic_slice_in_dim(x, dt * dilation, T, axis=1)
        acc = acc + jnp.einsum("btc,cd->btd", sl, w[dt],
                               precision=precision)
    return acc


rng = jax.random.PRNGKey(0)
CASES = [
    ("final 32->1 k7 T24000", (32, 24_006, 32), (7, 32, 1)),
    ("res 32->16 k3 T24000", (32, 24_002, 32), (3, 32, 16)),
    ("res 16->32 k1 T24000", (32, 24_000, 16), (1, 16, 32)),
    ("init 1->32 k7 T24000", (32, 24_006, 1), (7, 1, 32)),
    ("up2-in 64->32 mid", (32, 12_002, 64), (3, 64, 32)),
]

for name, xs, ws in CASES:
    x = jax.random.normal(rng, xs, jnp.float32)
    w = jax.random.normal(rng, ws, jnp.float32) * 0.1
    row = f"{name}:"
    for label, fn in [
        ("conv-HIGHEST", jax.jit(functools.partial(
            conv1d, precision=jax.lax.Precision.HIGHEST))),
        ("conv-HIGH", jax.jit(functools.partial(
            conv1d, precision=jax.lax.Precision.HIGH))),
        ("shift", jax.jit(conv_shift)),
    ]:
        g = jax.jit(lambda x, w, fn=fn: fn(x, w).sum())
        t = timeit_scalar(g, x, w)
        row += f"  {label} {1e3*t:.2f}"
    print(row + "  (ms)", flush=True)

