"""TPU microbenchmark v2: where does the codec's device time go?

Methodology (tunnel-safe): every probe is ONE jitted program whose output
is a SCALAR (so materialization costs nothing), timed with block+fetch
every iteration, best-of-N, minus measured RTT. Sequential work is chained
K times inside the program where a single application is too small.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())


def rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


RTT = rtt()
print(f"tunnel RTT: {1e3*RTT:.1f} ms")


def timeit_scalar(fn, *args, iters=8):
    """fn returns a scalar. Block+fetch every iteration; best-of minus RTT."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


from encodec_tpu.ops.lstm import init_lstm, lstm
from encodec_tpu.kernels.lstm_pallas import lstm_pallas

K = 8


def lstm_probe(precision, use_pallas=False):
    @jax.jit
    def f(p, x):
        def body(i, v):
            if use_pallas:
                y = lstm_pallas(p, v)
            else:
                y = lstm(p, v, precision=precision)
            return y * 0.5
        return jax.lax.fori_loop(0, K, body, x).sum()
    return f


for (B, T, H) in [(32, 75, 512), (11, 150, 512), (32, 750, 512)]:
    params = init_lstm(jax.random.PRNGKey(0), H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H), jnp.float32)
    row = f"lstm B{B} T{T} H{H}:"
    for label, prec, pal in [("HIGHEST", jax.lax.Precision.HIGHEST, False),
                             ("DEFAULT", None, False),
                             ("pallas", None, True)]:
        try:
            t = timeit_scalar(lstm_probe(prec, pal), params, x) / K
            row += f"  {label} {1e3*t:.2f} ms ({1e6*t/T:.2f} us/step)"
        except Exception as e:  # noqa: BLE001
            row += f"  {label} FAIL({repr(e)[:50]})"
    print(row, flush=True)

# full encode at the bench's 24 kHz shape, scalar-reduced
from encodec_tpu.models.model import build_model, encode_frame, decode_frame

model = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = model.cfg
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)

for label, kw in [("HIGHEST", dict()), ("DEFAULT", dict(precision=None))]:
    enc = jax.jit(lambda p, q, x: encode_frame(
        p, q, x, cfg, n_q=8, **kw)[0].sum())
    t = timeit_scalar(enc, model.params, model.qstate, x24)
    print(f"24k encode B32x1s {label}: {1e3*t:.2f} ms "
          f"({32.0/max(t,1e-9):.0f}x realtime device)", flush=True)

cfg_nolstm = dataclasses.replace(cfg, seanet=dataclasses.replace(
    cfg.seanet, lstm=0))
enc2 = jax.jit(lambda p, q, x: encode_frame(
    p, q, x, cfg_nolstm, n_q=8)[0].sum())
t = timeit_scalar(enc2, model.params, model.qstate, x24)
print(f"24k encode lstm=0 HIGHEST: {1e3*t:.2f} ms", flush=True)

# 24k decode, scalar-reduced
codes24 = jax.jit(lambda p, q, x: encode_frame(p, q, x, cfg, n_q=8)[0])(
    model.params, model.qstate, x24)
dec = jax.jit(lambda p, q, c: decode_frame(p, q, c, cfg, None).sum())
t = timeit_scalar(dec, model.params, model.qstate, codes24)
print(f"24k decode B32x1s HIGHEST: {1e3*t:.2f} ms", flush=True)

# 48 kHz fused segmented decode: same program as production + scalar sum
m48 = build_model(
    [3.0, 6.0, 12.0, 24.0], sample_rate=48_000, channels=2,
    causal=False, model_norm="time_group_norm", name="encodec_48khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32,
    audio_normalize=True, segment=1.0)
m48.set_target_bandwidth(24.0)
x48 = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 480_000)) * 0.2
frames = m48.encode(x48)
S = len(frames) - 1
codes_full = jnp.concatenate([frames[i][0] for i in range(S)], axis=0)
scales_full = jnp.concatenate([frames[i][1] for i in range(S)], axis=0)
codes_tail, scale_tail = frames[-1]
inner = m48._decode_fused_jit(S, m48.segment_stride or 1)
decf = jax.jit(lambda p, q, a, b, c, d: inner(p, q, a, b, c, d).sum())
t = timeit_scalar(decf, m48.params, m48.qstate, codes_full, scales_full,
                  codes_tail, scale_tail)
print(f"48k fused decode (10s): {1e3*t:.2f} ms", flush=True)

# 48k fused encode probe: replicate encode()'s segmentation inside one jit
seg_len = m48.segment_length
stride = m48.segment_stride
offs = list(range(0, x48.shape[-1], stride))


@jax.jit
def encf(p, q, x):
    xt = jnp.transpose(x, (0, 2, 1))
    segs = [xt[:, o:o + seg_len] for o in offs]
    full = jnp.concatenate(segs[:-1], axis=0)
    c1, s1 = encode_frame(p, q, full, m48.cfg, n_q=m48.n_q_active)
    c2, s2 = encode_frame(p, q, segs[-1], m48.cfg, n_q=m48.n_q_active)
    return c1.sum() + c2.sum() + s1.sum() + s2.sum()


t = timeit_scalar(encf, m48.params, m48.qstate, x48)
print(f"48k fused encode (10s): {1e3*t:.2f} ms", flush=True)
