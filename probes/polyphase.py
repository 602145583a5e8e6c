"""TPU A/B: polyphase vs input-dilated transposed conv, same process.

Times the FULL 24 kHz decoder (B=32) under both lowerings by patching
encodec_tpu.ops.conv.conv_transpose1d before tracing each variant.
Scalar-fetch probe, best-of-N, RTT-subtracted.
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


def timeit_scalar(fn, *args, iters=12):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


import encodec_tpu.ops.conv as C
from encodec_tpu.models.model import build_model, encode_frame, decode_frame

poly_impl = C.conv_transpose1d


def dilated_impl(x, w, b=None, *, stride=1, precision=None):
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)
    y = jax.lax.conv_general_dilated(
        x, w_flip, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=C._DIMENSION_NUMBERS,
        precision=precision)
    if b is not None:
        y = y + b
    return y


m = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = m.cfg
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)

for prec_label, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                         ("HIGH", jax.lax.Precision.HIGH)]:
    codes24 = jax.jit(lambda p, q, x: encode_frame(
        p, q, x, cfg, n_q=8, precision=prec)[0])(m.params, m.qstate, x24)
    jax.block_until_ready(codes24)
    for impl_label, impl in [("dilated", dilated_impl), ("poly", poly_impl),
                             ("dilated2", dilated_impl), ("poly2", poly_impl)]:
        C.conv_transpose1d = impl
        # fresh jit per variant (closure traces through the patched fn)
        dec = jax.jit(lambda p, q, c: decode_frame(
            p, q, c, cfg, None, precision=prec).sum())
        td = timeit_scalar(dec, m.params, m.qstate, codes24)
        print(f"24k decode B=32 {prec_label} {impl_label}: "
              f"{1e3*td:.2f} ms ({32/max(td,1e-9):.0f}x)", flush=True)
    C.conv_transpose1d = poly_impl
