"""TPU probe: where does the 24 kHz encoder's time go? (prefix timing)

Mirror of _prof_decoder.py for the encode side. Encoder head runs at
audio resolution with tiny channels (1->32 init conv, 32ch resblock) —
same lane-waste suspect as the decoder tail, but the encode path is
bit-exact-parity-critical so any lowering change needs a margin audit
first; this probe just quantifies the opportunity.
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


def timeit_scalar(fn, *args, iters=12):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0)


from encodec_tpu import ops
from encodec_tpu.models.model import build_model
from encodec_tpu.models.seanet import _act, apply_resblock
from encodec_tpu.quant.rvq import rvq_encode

m = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
cfg = m.cfg
scfg = cfg.seanet
x24 = jax.random.normal(jax.random.PRNGKey(0), (32, 24_000, 1), jnp.float32)

PREC = jax.lax.Precision.HIGHEST


def encode_prefix(p, q, x, *, n_stages, with_init=True, with_lstm=False,
                  with_final=False, with_rvq=False):
    ep = p["encoder"]
    y = x
    if with_init:
        y = ops.sconv1d(ep["init_conv"], y, kernel_size=scfg.kernel_size,
                        causal=scfg.causal, norm=scfg.norm,
                        pad_mode=scfg.pad_mode, precision=PREC)
    for stage, ratio in list(zip(ep["stages"],
                                 scfg.encoder_ratios))[:n_stages]:
        for j, res_p in enumerate(stage["res"]):
            y = apply_resblock(res_p, y, scfg,
                               [scfg.dilation_base ** j, 1], precision=PREC)
        y = _act(y, scfg.activation_alpha)
        y = ops.sconv1d(stage["down"], y, kernel_size=ratio * 2,
                        stride=ratio, causal=scfg.causal, norm=scfg.norm,
                        pad_mode=scfg.pad_mode, precision=PREC)
    if with_lstm and scfg.lstm:
        y = ops.lstm(ep["lstm"], y, skip=True, precision=PREC)
    if with_final:
        y = _act(y, scfg.activation_alpha)
        y = ops.sconv1d(ep["final_conv"], y,
                        kernel_size=scfg.last_kernel_size,
                        causal=scfg.causal, norm=scfg.norm,
                        pad_mode=scfg.pad_mode, precision=PREC)
    if with_rvq:
        codes = rvq_encode(q, y, cfg.rvq, n_q=8)
        return codes.sum()
    return y.sum()


steps = [
    ("init 1->32", dict(n_stages=0)),
    ("+st1 res+down8..", dict(n_stages=1)),
    ("+st2", dict(n_stages=2)),
    ("+st3", dict(n_stages=3)),
    ("+st4", dict(n_stages=4)),
    ("+lstm", dict(n_stages=4, with_lstm=True)),
    ("+final->128", dict(n_stages=4, with_lstm=True, with_final=True)),
    ("+rvq", dict(n_stages=4, with_lstm=True, with_final=True,
                  with_rvq=True)),
]
prev = 0.0
for name, kw in steps:
    g = jax.jit(lambda p, q, x, kw=kw: encode_prefix(p, q, x, **kw))
    t = timeit_scalar(g, m.params, m.qstate, x24)
    print(f"HIGHEST {name:18s}: cum {1e3*t:6.2f} ms "
          f"(delta {1e3*(t-prev):+6.2f} ms)", flush=True)
    prev = t
