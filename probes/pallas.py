"""TPU probe: Pallas vs XLA kernels, scalar-fetch methodology (round 3).

Re-measures the BENCH.md 'Pallas kernels vs XLA' table entries whose old
numbers were confounded by output materialization / early-returning
block_until_ready.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

f = jax.jit(lambda x: x + 1.0)
np.asarray(f(jnp.zeros(())))
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(f(jnp.zeros(())))
    best = min(best, time.perf_counter() - t0)
RTT = best
print(f"RTT {1e3*RTT:.1f} ms")


def timeit_scalar(fn, *args, iters=10):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


# ---- LSTM: XLA HIGHEST / XLA default / pallas (auto-chunk) ----
from encodec_tpu.ops.lstm import init_lstm, lstm
from encodec_tpu.kernels.lstm_pallas import lstm_pallas

B, T, H = 32, 750, 512
params = init_lstm(jax.random.PRNGKey(0), H)
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H), jnp.float32)
for label, fn in [
        ("xla HIGHEST", jax.jit(lambda p, x: lstm(
            p, x, precision=jax.lax.Precision.HIGHEST).sum())),
        ("xla default", jax.jit(lambda p, x: lstm(p, x).sum())),
        ("pallas", jax.jit(lambda p, x: lstm_pallas(p, x).sum()))]:
    try:
        t = timeit_scalar(fn, params, x)
        print(f"lstm B{B} T{T} H{H} {label}: {1e3*t:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lstm {label}: FAIL {repr(e)[:100]}", flush=True)

# parity check pallas vs xla
try:
    a = jax.jit(lambda p, x: lstm(
        p, x, precision=jax.lax.Precision.HIGHEST))(params, x)
    b = jax.jit(lambda p, x: lstm_pallas(p, x))(params, x)
    print("pallas max abs diff:", float(jnp.max(jnp.abs(a - b))), flush=True)
except Exception as e:  # noqa: BLE001
    print("pallas parity FAIL", repr(e)[:100], flush=True)

# ---- RVQ: single-stage search + fused full-RVQ ----
from encodec_tpu.quant.rvq import _nearest as nearest_codes_xla
from encodec_tpu.kernels.vq_pallas import (
    nearest_codebook_pallas as nearest_codes_pallas, rvq_encode_pallas)

D, bins = 128, 1024
emb = jax.random.normal(jax.random.PRNGKey(2), (24_000, D), jnp.float32)
books = jax.random.normal(jax.random.PRNGKey(3), (32, bins, D), jnp.float32)

one_x = jax.jit(lambda e, b: nearest_codes_xla(e, b).sum())
one_p = jax.jit(lambda e, b: nearest_codes_pallas(e, b).sum())
for label, fn in [("xla", one_x), ("pallas", one_p)]:
    try:
        t = timeit_scalar(fn, emb, books[0])
        print(f"rvq single-stage 24k x {bins} {label}: {1e6*t:.0f} us",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"rvq single {label}: FAIL {repr(e)[:100]}", flush=True)


def fused_shapes():
    for (N, n_q) in [(2_400, 8), (24_000, 8), (24_000, 32)]:
        e = jax.random.normal(jax.random.PRNGKey(4), (N, D), jnp.float32)

        @jax.jit
        def xla_chain(e, bk):
            def step(res, b):
                idx = nearest_codes_xla(res, b)
                return res - b[idx], idx
            _, codes = jax.lax.scan(step, e, bk)
            return codes.sum()

        @jax.jit
        def pal(e, bk):
            return rvq_encode_pallas(e, bk, n_q=bk.shape[0]).sum()

        for label, fn in [("xla", xla_chain), ("pallas_fused", pal)]:
            try:
                t = timeit_scalar(fn, e, books[:n_q])
                print(f"full-RVQ N={N} n_q={n_q} {label}: {1e6*t:.0f} us",
                      flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"full-RVQ N={N} n_q={n_q} {label}: FAIL "
                      f"{repr(exc)[:100]}", flush=True)


fused_shapes()
