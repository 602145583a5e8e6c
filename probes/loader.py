"""Measure input-pipeline overlap with the device train step (real chip).

VERDICT r3 #7: the threaded DataLoader + prefetch exist — quantify what
they buy at the production config (batch 8 x 4 h @ 10 Hz nights, motion-
detect preprocessing in __getitem__, ~0.7 s/step of device compute).

Three numbers:
  1. loader-only: host time to produce one batch (workers=0);
  2. serial loop: load -> step, no overlap (workers=0);
  3. overlapped loop: workers=W, prefetch=P — the loader threads shadow
     the device step (numpy/scipy release the GIL; the device computes
     while the host prepares the next batch even on this 1-core host).

Usage: timeout 1800 python probes/loader.py [--smoke]
"""
import os as _os
import sys
import tempfile
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SMOKE = "--smoke" in sys.argv


def main():
    from encodec_tpu.data import BreathingDataset, MergedDataset, DataLoader
    from encodec_tpu.models.model import build_model
    from encodec_tpu.train import (LossWeights, create_train_state,
                                   make_train_steps)

    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind, flush=True)

    # synthetic 4 h nights (144k samples @ 10 Hz) with realistic structure
    # so motion-detect does real work
    tmp = tempfile.mkdtemp(prefix="loaderprobe_")
    d = _os.path.join(tmp, "synth", "thorax")
    _os.makedirs(d)
    rng = np.random.RandomState(0)
    n_nights = 4 if SMOKE else 16
    length = 12_000 if SMOKE else 150_000
    for i in range(n_nights):
        t = np.arange(length) / 10.0
        sig = (np.sin(2 * np.pi * 0.3 * t) + 0.1 * rng.randn(length)
               + 2.0 * (rng.rand(length) < 0.001))   # motion spikes
        np.savez(_os.path.join(d, f"n{i}.npz"),
                 data=sig.astype(np.float32), fs=10)

    max_len = 6_000 if SMOKE else 144_000
    bsz = 2 if SMOKE else 8

    def make_loader(workers, prefetch=4):
        ds = BreathingDataset(tmp, "synth", mode="train", max_length=max_len,
                              rng=np.random.RandomState(1))
        merged = MergedDataset([ds], [1.0], sfreq=1.0, debug=True,
                               rng=np.random.RandomState(2))
        return DataLoader(merged, bsz, seed=0, num_workers=workers,
                          prefetch=prefetch)

    import dataclasses
    model = build_model(
        [0.08], sample_rate=10, channels=1, causal=True,
        model_norm="layer_norm", name="breathing_model",
        ratios=[6, 5, 5, 2, 1], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 256, n_filters=8 if SMOKE else 32,
        decoder_final_norm="none", shared_codebook=True)
    # production setting: per-stage remat — the full-batch 4 h step does
    # not fit HBM otherwise (BENCH.md production train-step section)
    seanet = dataclasses.replace(model.cfg.seanet, remat=True)
    model.cfg = dataclasses.replace(model.cfg, seanet=seanet)
    state, _, _ = create_train_state(model, None, seed=0)
    gen_step, _, _, _ = make_train_steps(
        model.cfg, None, freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
    weights = LossWeights.make(lr=3e-4)

    # warm the executable
    warm = jnp.asarray(rng.randn(bsz, max_len, 1), jnp.float32)
    state2, m = gen_step(state, warm, weights, use_gan=False)
    float(np.asarray(m["loss"]))
    print("step compiled", flush=True)

    # 1. loader-only cost
    ld = make_loader(0)
    it = iter(ld)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for batch, _ in it:
        n += 1
        if n >= (2 if SMOKE else 6):
            break
    t_load = (time.perf_counter() - t0) / n
    print(f"loader-only: {t_load*1e3:.0f} ms/batch", flush=True)

    def loop(workers, label, prefetch=4):
        ld = make_loader(workers, prefetch)
        st = state
        # warm one iteration (thread spin-up, first prefetch fill)
        it = iter(ld)
        batch, _ = next(it)
        st, m = gen_step(st, jnp.asarray(batch["x"]), weights, use_gan=False)
        float(np.asarray(m["loss"]))
        t0 = time.perf_counter()
        n = 0
        for batch, _ in it:
            st, m = gen_step(st, jnp.asarray(batch["x"]), weights,
                             use_gan=False)
            n += 1
            if n >= (2 if SMOKE else 6):
                break
        float(np.asarray(m["loss"]))   # final sync
        t = (time.perf_counter() - t0) / n
        print(f"{label}: {t*1e3:.0f} ms/step over {n} steps", flush=True)
        return t

    t_serial = loop(0, "serial loop (workers=0)")
    t_overlap = loop(2, "overlapped (workers=2, prefetch=4)")
    t_overlap8 = loop(8, "overlapped (workers=8, prefetch=4)")
    print(f"overlap saving: {100*(1 - t_overlap/t_serial):.0f}% (w=2), "
          f"{100*(1 - t_overlap8/t_serial):.0f}% (w=8); "
          f"host fraction shadowed: loader {t_load*1e3:.0f} ms vs "
          f"step {t_serial*1e3:.0f} ms", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
