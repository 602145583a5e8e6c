"""TPU probe: where does the 24 kHz decoder's time go? (prefix timing)

Times scalar-reduced jitted programs that run increasing prefixes of the
decode pipeline; consecutive differences give per-stage cost. Scalar-fetch
methodology (see BENCH.md round-3 methodology correction).
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


from encodec_tpu import ops
from encodec_tpu.models.model import build_model, encode_frame
from encodec_tpu.models.seanet import _act, apply_resblock
from encodec_tpu.quant.rvq import rvq_decode

m = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = m.cfg
scfg = cfg.seanet
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)
codes = jax.jit(lambda p, q, x: encode_frame(
    p, q, x, cfg, n_q=8)[0])(m.params, m.qstate, x24)
jax.block_until_ready(codes)


def decode_prefix(p, q, c, *, n_stages, with_init=True, with_lstm=True,
                  with_final=False, precision=None):
    dp = p["decoder"]
    y = rvq_decode(q, jnp.transpose(c, (1, 0, 2)), cfg.rvq)
    if with_init:
        y = ops.sconv1d(dp["init_conv"], y, kernel_size=scfg.kernel_size,
                        causal=scfg.causal, norm=scfg.norm,
                        pad_mode=scfg.pad_mode, precision=precision)
    if with_lstm and scfg.lstm:
        y = ops.lstm(dp["lstm"], y, skip=True, precision=precision)
    for stage, ratio in list(zip(dp["stages"], scfg.ratios))[:n_stages]:
        y = _act(y, scfg.activation_alpha)
        y = ops.sconv_transpose1d(stage["up"], y, kernel_size=ratio * 2,
                                  stride=ratio, causal=scfg.causal,
                                  norm=scfg.norm,
                                  trim_right_ratio=scfg.trim_right_ratio,
                                  precision=precision)
        for j, res_p in enumerate(stage["res"]):
            y = apply_resblock(res_p, y, scfg,
                               [scfg.dilation_base ** j, 1],
                               precision=precision)
    if with_final:
        y = _act(y, scfg.activation_alpha)
        y = ops.sconv1d(dp["final_conv"], y,
                        kernel_size=scfg.last_kernel_size,
                        causal=scfg.causal,
                        norm=scfg.resolved_decoder_final_norm(),
                        pad_mode=scfg.pad_mode, precision=precision)
    return y.sum()


for prec_label, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                         ("HIGH", jax.lax.Precision.HIGH)]:
    steps = [
        ("dequant", dict(n_stages=0, with_init=False, with_lstm=False)),
        ("+init_conv", dict(n_stages=0, with_lstm=False)),
        ("+lstm", dict(n_stages=0)),
        ("+up8", dict(n_stages=1)),
        ("+up5", dict(n_stages=2)),
        ("+up4", dict(n_stages=3)),
        ("+up2", dict(n_stages=4)),
        ("+final", dict(n_stages=4, with_final=True)),
    ]
    prev = 0.0
    for name, kw in steps:
        g = jax.jit(lambda p, q, c, kw=kw: decode_prefix(
            p, q, c, precision=prec, **kw))
        t = timeit_scalar(g, m.params, m.qstate, codes)
        print(f"{prec_label} {name:11s}: cum {1e3*t:6.2f} ms "
              f"(delta {1e3*(t - prev):+6.2f} ms)", flush=True)
        prev = t
