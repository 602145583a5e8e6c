"""Benchmark: batched 24 kHz encode (SEANet encoder + RVQ) throughput.

Run on the attached TPU chip; prints ONE JSON line:
  {"metric": "encode_rtf_24khz", "value": N, "unit": "x_realtime",
   "vs_baseline": N / 200}

Baseline (BASELINE.md): >= 200x realtime batched encode+RVQ per v5e chip.
The benchmark uses the flagship 24 kHz architecture at 6 kbps (8 codebooks)
on a batch of 1-second windows — the codec's production serving shape —
with f32 weights on the standard inference path.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass


def main():
    from encodec_tpu.models.model import build_model, encode_frame

    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
        causal=True, model_norm="weight_norm", name="encodec_24khz",
        ratios=[8, 5, 4, 2], bins=1024, dimension=128)
    cfg = model.cfg

    B, T = 32, 24_000  # 32 seconds of audio per step

    @jax.jit
    def encode(params, qstate, x):
        return encode_frame(params, qstate, x, cfg, n_q=8)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 1), jnp.float32)

    # compile + warmup (materialize to force a full sync through the
    # device tunnel — block_until_ready alone can under-report there)
    import numpy as np
    codes, _ = encode(model.params, model.qstate, x)
    np.asarray(codes)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        codes, _ = encode(model.params, model.qstate, x)
        jax.block_until_ready(codes)
    # one final host materialization to close the pipeline
    np.asarray(codes)
    dt = time.perf_counter() - t0

    audio_seconds = iters * B * T / 24_000
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "encode_rtf_24khz",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 200.0, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
