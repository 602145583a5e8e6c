"""TPU probe: codec RTFs at precision=high vs highest (scalar-fetch)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
from encodec_tpu.models.model import build_model, encode_frame, decode_frame

f = jax.jit(lambda x: x + 1.0)
np.asarray(f(jnp.zeros(())))
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(f(jnp.zeros(())))
    best = min(best, time.perf_counter() - t0)
RTT = best
print(f"RTT {1e3*RTT:.1f} ms")


def timeit_scalar(fn, *args, iters=8):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


m = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = m.cfg
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)
for label, prec in [("highest", jax.lax.Precision.HIGHEST),
                    ("high", jax.lax.Precision.HIGH)]:
    enc = jax.jit(lambda p, q, x: encode_frame(
        p, q, x, cfg, n_q=8, precision=prec)[0].sum())
    t = timeit_scalar(enc, m.params, m.qstate, x24)
    codes24 = jax.jit(lambda p, q, x: encode_frame(
        p, q, x, cfg, n_q=8, precision=prec)[0])(m.params, m.qstate, x24)
    dec = jax.jit(lambda p, q, c: decode_frame(
        p, q, c, cfg, None, precision=prec).sum())
    td = timeit_scalar(dec, m.params, m.qstate, codes24)
    print(f"24k {label}: encode {1e3*t:.2f} ms ({32/max(t,1e-9):.0f}x) "
          f"decode {1e3*td:.2f} ms ({32/max(td,1e-9):.0f}x)", flush=True)

m48 = build_model(
    [3.0, 6.0, 12.0, 24.0], sample_rate=48_000, channels=2,
    causal=False, model_norm="time_group_norm", name="encodec_48khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32,
    audio_normalize=True, segment=1.0)
m48.set_target_bandwidth(24.0)
x48 = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 480_000)) * 0.2
pick = jax.jit(lambda y: y.ravel()[0])
for label in ("highest", "high"):
    m48.set_precision(label)
    out = m48.decode(m48.encode(x48))
    float(np.asarray(pick(out)))
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        float(np.asarray(pick(m48.decode(m48.encode(x48)))))
        best = min(best, time.perf_counter() - t0)
    print(f"48k roundtrip {label}: {1e3*best:.1f} ms serialized "
          f"({10.0/best:.0f}x), {10.0/max(best-RTT,1e-9):.0f}x corrected",
          flush=True)
