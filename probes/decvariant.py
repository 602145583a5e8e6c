"""TPU A/B: full 24 kHz decode with small-channel convs in shift form.

Patches ops.conv.conv1d with a dispatcher (predicate on static shapes)
and times the FULL decode_frame per variant — captures fusion/layout
interactions the isolated-op probe cannot see.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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


def timeit_scalar(fn, *args, iters=14):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


import encodec_tpu.ops.conv as C
from encodec_tpu.models.model import build_model, encode_frame, decode_frame

base_conv1d = C.conv1d


def shift_conv1d(x, w, b=None, *, stride=1, dilation=1, groups=1,
                 precision=None):
    assert stride == 1 and groups == 1
    k, cin, cout = w.shape
    T = x.shape[1] - (k - 1) * dilation
    acc = jnp.zeros((x.shape[0], T, cout), x.dtype)
    for dt in range(k):
        sl = jax.lax.dynamic_slice_in_dim(x, dt * dilation, T, axis=1)
        if cout == 1:
            acc = acc + (sl * w[dt, :, 0]).sum(-1, keepdims=True)
        else:
            acc = acc + jnp.einsum("btc,cd->btd", sl, w[dt],
                                   precision=jax.lax.Precision.HIGHEST)
    if b is not None:
        acc = acc + b
    return acc


def make_dispatch(pred):
    def conv1d(x, w, b=None, *, stride=1, dilation=1, groups=1,
               precision=None):
        k, cin, cout = w.shape
        if stride == 1 and groups == 1 and pred(k, cin, cout):
            return shift_conv1d(x, w, b, dilation=dilation,
                                precision=precision)
        return base_conv1d(x, w, b, stride=stride, dilation=dilation,
                           groups=groups, precision=precision)
    return conv1d


m = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = m.cfg
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)
codes = jax.jit(lambda p, q, x: encode_frame(
    p, q, x, cfg, n_q=8)[0])(m.params, m.qstate, x24)
jax.block_until_ready(codes)

VARIANTS = [
    ("baseline", None),
    ("final-only (cout==1)", lambda k, ci, co: co == 1),
    ("small<=512", lambda k, ci, co: ci * co <= 512),
    ("small<=2048", lambda k, ci, co: ci * co <= 2048),
    ("baseline2", None),
]

ref = None
for name, pred in VARIANTS:
    C.conv1d = base_conv1d if pred is None else make_dispatch(pred)
    dec = jax.jit(lambda p, q, c: decode_frame(p, q, c, cfg, None).sum())
    t = timeit_scalar(dec, m.params, m.qstate, codes)
    # numerics vs baseline
    decfull = jax.jit(lambda p, q, c: decode_frame(p, q, c, cfg, None))
    y = decfull(m.params, m.qstate, codes)
    y0 = np.asarray(jax.jit(lambda y: y[0, :64, 0])(y))
    if ref is None:
        ref = y0
    err = float(np.abs(y0 - ref).max())
    print(f"decode 24k B32 HIGHEST [{name}]: {1e3*t:.2f} ms "
          f"({32/max(t,1e-9):.0f}x)  probe-err {err:.2e}", flush=True)
C.conv1d = base_conv1d
