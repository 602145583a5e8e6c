"""Can set_precision('fast') be a TIE-GUARDED `.ecdc` writer? (VERDICT r4 #3)

The near-tie guard (models/model.py::encode_guarded) exists so reduced-
precision writers stay byte-identical with the 'highest' parity writer:
positions whose in-graph top-2 margin falls under a threshold are
re-resolved on host in f64. 'high' (3-pass bf16) is certified through it;
'fast' (single-pass bf16 MXU) was refused outright because its distance
drift was assumed to exceed any usable threshold. Measure instead of
assume. For each model on the reference wav fixtures, and for a TRAINED
small codec (the tight-margin regime), sweep the guard threshold and
report, per (model, threshold):

  flips    guarded-'fast' codes != guarded-'highest' codes (must be 0
           for certification — covers BOTH unflagged-position drift and
           f64 re-resolutions diverging through encoder z-drift);
  flagged  positions the guard re-resolves (host cost volume);
  wall     encode_guarded wall time vs the 'highest' parity encode.

Certification = a threshold with zero flips, small flagged volume, and a
real throughput win. Anything else is the measured blocker. CPU runs are
meaningless ('fast' == f32 there) — run on the chip.

Usage: timeout 3600 python probes/fast_writer.py [--trained-only]
"""
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLDS = (1e-3, 1e-2, 1e-1)


def _sync(frames):
    for c, s in frames:
        jax.block_until_ready(c)


def _codes(frames):
    return [np.asarray(c) for c, _ in frames]


def compare(model, x, label, n_iter=3):
    model.set_precision("highest")
    f_hi, stats_hi = model.encode_guarded(x)
    base = _codes(f_hi)
    # parity-writer wall time (the guarded 'highest' path every .ecdc
    # write takes today)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _sync(model.encode_guarded(x)[0])
    t_hi = (time.perf_counter() - t0) / n_iter

    total = sum(c.size for c in base)
    print(f"\n{label}: positions={stats_hi['n_positions']} "
          f"codes={total} min_margin(highest)={stats_hi['min_margin']:.3e} "
          f"guarded-highest wall={1e3 * t_hi:.1f} ms", flush=True)

    for mode in ("high", "fast"):
        model.set_precision(mode)
        for thr in THRESHOLDS:
            f_lo, st = model.encode_guarded(x, threshold=thr)
            flips = sum(int((a != b).sum())
                        for a, b in zip(base, _codes(f_lo)))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                _sync(model.encode_guarded(x, threshold=thr)[0])
            t_lo = (time.perf_counter() - t0) / n_iter
            print(f"  {mode:5s} thr={thr:7.0e}  flips={flips:6d}/{total} "
                  f"flagged={st['n_flagged']:6d} "
                  f"changed={st['n_changed']:5d} "
                  f"wall={1e3 * t_lo:7.1f} ms "
                  f"({t_hi / t_lo:4.2f}x vs guarded-highest)", flush=True)
    model.set_precision("highest")


def main():
    from tests.margin_audit import build_pair, audit_trained  # noqa: F401
    from tests.test_real_checkpoints import WAVS, _load_wav

    print("platform:", jax.devices()[0].platform, flush=True)
    if jax.devices()[0].platform == "cpu":
        print("WARNING: CPU — 'fast' numerics identical to f32; "
              "results do not certify anything.", flush=True)

    if "--trained-only" not in sys.argv:
        for name in ("encodec_24khz", "encodec_48khz"):
            _, model = build_pair(name)
            wav, sr = _load_wav(WAVS[name])
            wav = wav[:, :sr * 3]
            model.set_target_bandwidth(6.0)
            compare(model, jnp.asarray(wav)[None], f"{name} 3s @6kbps")

    # trained regime: reuse the margin-audit training pipeline, then
    # compare guarded writers on held-out signals
    from encodec_tpu.train.steps import (create_train_state,
                                         make_train_steps, LossWeights)
    from encodec_tpu.models.model import build_model
    rng = np.random.RandomState(0)

    def batch(n=4, T=600):
        t = np.arange(T) / 10.0
        f = rng.uniform(0.15, 0.4, size=(n, 1))
        ph = rng.uniform(0, 2 * np.pi, size=(n, 1))
        sig = np.sin(2 * np.pi * f * t[None] + ph) + 0.05 * rng.randn(n, T)
        return jnp.asarray(sig[..., None], jnp.float32)

    model = build_model([0.08], sample_rate=10, channels=1, causal=True,
                        model_norm="weight_norm", name="trained_fast_audit",
                        ratios=[5, 2, 1], bins=32, dimension=16, n_filters=4,
                        decoder_final_norm="none", kmeans_init=True, seed=0)
    state, _, _ = create_train_state(model, None, seed=0)
    gen_step, _, _, _ = make_train_steps(
        model.cfg, None,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10, alpha=0.01, bandwidth=None))
    weights = LossWeights.make(l1=1.0, freq=0.25, commit=0.25, lr=1e-3)
    for i in range(300):
        state, metrics = gen_step(state, batch(), weights, False)
    model.params, model.qstate = state.params, state.qstate
    model.set_target_bandwidth(0.08)
    print(f"\ntrained codec: loss={float(metrics['loss']):.3f}")
    held = np.transpose(np.asarray(batch(n=4, T=600)), (0, 2, 1))
    compare(model, jnp.asarray(held), "trained codec 4x60s")
    print("DONE")


if __name__ == "__main__":
    main()
