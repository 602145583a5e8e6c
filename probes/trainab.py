"""TPU A/B: production train step with vs without the decoder shift lowering.

The decoder's lowering="auto" now applies to the f32 training forward;
this measures the full generator step (B=8 x 4 h breathing config, remat)
both ways by toggling the dispatch threshold before tracing.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

import encodec_tpu.ops.conv as C
from encodec_tpu.models.model import build_model
from encodec_tpu.train import LossWeights, create_train_state, make_train_steps

model = build_model(
    [0.08], sample_rate=10, channels=1, causal=True,
    model_norm="layer_norm", name="breathing_model",
    ratios=[6, 5, 5, 2, 1], bins=1024, dimension=256, n_filters=32,
    decoder_final_norm="none", shared_codebook=True)
seanet = dataclasses.replace(model.cfg.seanet, remat=True)
model.cfg = dataclasses.replace(model.cfg, seanet=seanet)
state, _, _ = create_train_state(model, None, seed=0)
weights = LossWeights.make(lr=3e-4)
batch = jnp.asarray(np.random.RandomState(0).randn(8, 144_000, 1),
                    jnp.float32)


def measure(thresh):
    C._SHIFT_LOWERING_MAX_CINCOUT = thresh
    gen_step, _, _, _ = make_train_steps(
        model.cfg, None, freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
    st, metrics = gen_step(state, batch, weights, use_gan=False)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        st, metrics = gen_step(st, batch, weights, use_gan=False)
        jax.block_until_ready(metrics["loss"])
    loss = float(metrics["loss"])
    return (time.perf_counter() - t0) / 5, loss


for label, thresh in [("mxu (thresh=0)", 0), ("shift<=512", 512),
                      ("mxu2", 0), ("shift2", 512)]:
    t, loss = measure(thresh)
    print(f"gen step {label}: {t:.3f} s/step  loss {loss:.6f}", flush=True)
C._SHIFT_LOWERING_MAX_CINCOUT = 512
