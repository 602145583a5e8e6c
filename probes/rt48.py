"""Public-API 48k segmented roundtrip: honest serialized wall time.

Fetches a single element (jitted picker) per iteration instead of
materializing audio — isolates dispatch/eager-op overhead from the
tunnel's copy bandwidth.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
from encodec_tpu.models.model import build_model

pick = jax.jit(lambda y: y.ravel()[0])
f = jax.jit(lambda x: x + 1.0)
np.asarray(f(jnp.zeros(())))
RTT = min(time.perf_counter() * 0 + (lambda: (
    [t := time.perf_counter(), np.asarray(f(jnp.zeros(()))),
     time.perf_counter() - t][-1]))() for _ in range(10))
print(f"RTT {1e3*RTT:.1f} ms")

m48 = build_model(
    [3.0, 6.0, 12.0, 24.0], sample_rate=48_000, channels=2,
    causal=False, model_norm="time_group_norm", name="encodec_48khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32,
    audio_normalize=True, segment=1.0)
m48.set_target_bandwidth(24.0)
x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 480_000)) * 0.2

# warm all the jits
out = m48.decode(m48.encode(x))
float(np.asarray(pick(out)))


def best_of(fn, n=8):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


t_enc = best_of(lambda: float(np.asarray(pick(m48.encode(x)[0][0]))))
print(f"encode() + pick: {1e3*t_enc:.1f} ms")

frames = m48.encode(x)
jax.block_until_ready([f[0] for f in frames])
t_dec = best_of(lambda: float(np.asarray(pick(m48.decode(frames)))))
print(f"decode() + pick: {1e3*t_dec:.1f} ms")

t_rt = best_of(
    lambda: float(np.asarray(pick(m48.decode(m48.encode(x))))))
print(f"roundtrip + pick: {1e3*t_rt:.1f} ms "
      f"({10.0/t_rt:.0f}x realtime serialized, pick-fetch)")

# what the current bench pays: block on all leaves instead of pick
t_rt2 = best_of(lambda: (jax.block_until_ready(
    jax.tree.leaves(m48.decode(m48.encode(x)))), None)[1])
print(f"roundtrip block_until_ready: {1e3*t_rt2:.1f} ms")

# materialized (the deployment worst case: audio in AND out over tunnel)
xi = np.asarray(x)


def full():
    fr = m48.encode(jnp.asarray(xi))
    return np.asarray(m48.decode(fr))


_ = full()
t_rt3 = best_of(lambda: full(), n=4)
print(f"roundtrip fully materialized: {1e3*t_rt3:.1f} ms")
