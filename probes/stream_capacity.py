"""Concurrent real-time stream capacity per chip.

How many independent full-duplex 24 kHz streams (encode one hop ->
decode one hop, 6 kbps) can one chip sustain in real time? The streaming
state is batched natively ([B, C, L] chunks), so B concurrent streams
run as ONE batched streaming step. A batch step is real-time feasible
when its sustained per-step device time fits the 13.33 ms hop budget.

Methodology: steady-state (post-priming) steps timed with the PIPELINED
pattern (N back-to-back encode+decode step dispatches, one final
single-element sync) — on TPU the execution stream runs programs in
dispatch order, so the last scalar being ready implies all prior steps
finished; the tunnel RTT amortizes over N. A serving deployment feeding
hops on a real-time clock sees exactly this steady-state rate.

Reference point: the torch reference streams via its batch model on CPU
per file (no streaming API; compress.py processes whole files), so there
is no upstream analogue — the capacity number here is TPU-native
headroom, recorded in BENCH.md.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

from encodec_tpu.models.model import build_model
from encodec_tpu.models.streaming import (StreamingCodec, min_first_chunk,
                                          min_first_latent_chunk)

pick = jax.jit(lambda y: y.ravel()[0])

model = build_model(
    [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
    causal=True, model_norm="weight_norm", name="encodec_24khz",
    ratios=[8, 5, 4, 2], bins=1024, dimension=128, n_filters=32)
model.set_target_bandwidth(6.0)
HOP_MS = 1e3 * model.cfg.seanet.hop_length / 24_000

rng = np.random.RandomState(0)


def prime(sc: StreamingCodec, batch: int) -> None:
    """Run the first-chunk executables so steady-state steps are warm."""
    sc.reset()
    hop = sc.hop
    first = max(min_first_chunk(model.cfg.seanet), hop)
    first = ((first + hop - 1) // hop) * hop
    c = sc.encode_chunk(jnp.asarray(rng.randn(batch, 1, first),
                                    jnp.float32))
    need = min_first_latent_chunk(model.cfg.seanet)
    while c.shape[2] < need:
        c = jnp.concatenate(
            [c, sc.encode_chunk(jnp.asarray(rng.randn(batch, 1, hop),
                                            jnp.float32))], axis=2)
    np.asarray(sc.decode_chunk(c))


def steady_step_ms(batch: int, n: int = 30) -> float:
    sc = StreamingCodec(model)
    prime(sc, batch)
    chunk = jnp.asarray(rng.randn(batch, 1, sc.hop), jnp.float32)

    def step():
        return sc.decode_chunk(sc.encode_chunk(chunk))

    float(np.asarray(pick(step())))  # compile steady-state executables
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = step()
        float(np.asarray(pick(out)))
        best = min(best, (time.perf_counter() - t0) / n)
    return 1e3 * best


print(f"hop budget {HOP_MS:.2f} ms; pipelined steady-state step time:")
capacity = 0
rows = []
for B in (1, 8, 32, 64, 128, 256, 512, 1024, 2048, 4096):
    t_ms = steady_step_ms(B)
    ok = t_ms <= HOP_MS
    rows.append((B, t_ms, ok))
    print(f"  B={B:4d}: {t_ms:7.2f} ms/step "
          f"({B * HOP_MS / t_ms:7.0f}x realtime aggregate) "
          f"{'REALTIME' if ok else 'over budget'}")
    if ok:
        capacity = B
    else:
        break

print(f"\ncapacity: {capacity} concurrent full-duplex 6 kbps streams "
      f"per chip (largest measured batch whose sustained step fits the "
      f"{HOP_MS:.2f} ms hop)")
