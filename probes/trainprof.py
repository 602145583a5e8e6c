"""Profile the production generator train step on the real chip.

Questions:
  1. FLOP/byte budget of the step (XLA cost analysis).
  2. remat=True vs remat=False: does the no-remat step fit HBM, and how
     much recompute does per-stage remat cost at the production shape?
  3. forward-only vs full step split.

Usage: timeout 1200 python probes/trainprof.py [--smoke]
"""
import dataclasses
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SMOKE = "--smoke" in sys.argv


def main():
    from encodec_tpu.models.model import build_model, forward_train
    from encodec_tpu.train import LossWeights, create_train_state, make_train_steps

    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)
    # liveness probe
    t0 = time.perf_counter()
    x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
    print("probe:", float(x), f"{time.perf_counter()-t0:.1f}s")

    def mk(remat: bool):
        model = build_model(
            [0.08], sample_rate=10, channels=1, causal=True,
            model_norm="layer_norm", name="breathing_model",
            ratios=[6, 5, 5, 2, 1], bins=64 if SMOKE else 1024,
            dimension=32 if SMOKE else 256, n_filters=8 if SMOKE else 32,
            decoder_final_norm="none", shared_codebook=True)
        seanet = dataclasses.replace(model.cfg.seanet, remat=remat)
        model.cfg = dataclasses.replace(model.cfg, seanet=seanet)
        return model

    bsz, blen = (1, 6_000) if SMOKE else (8, 144_000)
    batch = jnp.asarray(np.random.RandomState(0).randn(bsz, blen, 1),
                        jnp.float32)
    weights = LossWeights.make(lr=3e-4)

    def timed(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        # scalar fetch to defeat early-return block_until_ready
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / iters

    for remat in (True, False):
        model = mk(remat)
        state, _, _ = create_train_state(model, None, seed=0)
        gen_step, _, _, _ = make_train_steps(
            model.cfg, None,
            freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
        lowered = jax.jit(
            lambda st, b, w: gen_step(st, b, w, use_gan=False)
        ).lower(state, batch, weights)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        mem = compiled.memory_analysis()
        try:
            t = timed(lambda st, b: gen_step(st, b, weights, use_gan=False),
                      state, batch, iters=2 if SMOKE else 5)
            print(f"remat={remat}: {t*1e3:.1f} ms/step  "
                  f"flops={flops/1e12:.2f}T  bytes={bytes_acc/1e9:.1f}GB  "
                  f"peak_hbm={getattr(mem, 'temp_size_in_bytes', 0)/1e9:.2f}GB+"
                  f"args={getattr(mem, 'argument_size_in_bytes', 0)/1e9:.2f}GB")
            print(f"  -> f32 MXU floor (49 TF/s): {flops/49e12*1e3:.0f} ms; "
                  f"HBM floor (819GB/s): {bytes_acc/819e9*1e3:.0f} ms")
        except Exception as e:
            print(f"remat={remat}: FAILED {type(e).__name__}: {str(e)[:200]}")

        # forward-only split
        def fwd(params, qstate, b, rng):
            return forward_train(params, qstate, b, model.cfg,
                                 model.cfg.rvq.n_q, rng, training=True)
        jf = jax.jit(fwd)
        rng = jax.random.PRNGKey(0)
        try:
            t = timed(lambda p, q, b: jf(p, q, b, rng), state.params,
                      state.qstate, batch, iters=2 if SMOKE else 5)
            print(f"  forward_train only: {t*1e3:.1f} ms")
        except Exception as e:
            print(f"  forward FAILED {type(e).__name__}: {str(e)[:160]}")

    # bf16 variants
    for remat in (True, False):
        model = mk(remat)
        state, _, _ = create_train_state(model, None, seed=0)
        gen_bf16, _, _, _ = make_train_steps(
            model.cfg, None, compute_dtype=jnp.bfloat16,
            freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
        try:
            t = timed(lambda st, b: gen_bf16(st, b, weights, use_gan=False),
                      state, batch, iters=2 if SMOKE else 5)
            print(f"bf16 remat={remat}: {t*1e3:.1f} ms/step")
        except Exception as e:
            print(f"bf16 remat={remat}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
