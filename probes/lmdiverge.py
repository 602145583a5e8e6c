"""TPU probe: quantify the cross-executable LM probability divergence.

The fast LM decode tiers (pair executable, fused device decoder) rely on
`lax.scan` executables with identical bodies being bitwise mutually
exact across trip counts. The 2026-08-18 recheck found this no longer
holds on the restarted tunnel backend (it held when measured for
b25439b/2667e1d). This probe measures HOW different the executables are:

  - per-token count of bitwise-differing probability elements
  - max |delta| and max ulp distance
  - whether the QUANTIZED CDF ROWS (the actual range-coder inputs,
    `batch_cdf_row_exec`) agree — the reference's stable-CDF roundoff
    (ref ac.py:18-53) exists precisely to absorb ulp drift, so CDF-row
    equality is the exact invariant byte-correct decode needs.

Prints a summary; no repo state is changed.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)
    from encodec_tpu.models.lm import LMModel, LMConfig, init_lm

    if "--tiny" in _sys.argv:
        # the probes/recheck.py configuration whose fast tiers demoted on
        # the 2026-08-18 TPU backend even under row gating — quantify how
        # far past the quantization floor the tiny-shape drift goes
        K, card, chunk = 8, 1024, 256
        cfg = LMConfig(n_q=32, card=card, dim=32, num_layers=1,
                       past_context=40)
        print("config: tiny (recheck.py shapes: dim=32, 1 layer)",
              flush=True)
    else:
        K, card, chunk = 8, 1024, 256
        cfg = LMConfig(n_q=K, card=card, dim=200, num_layers=5,
                       past_context=int(3.5 * 75))
        print("config: production 24 kHz LM", flush=True)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    lm = LMModel(cfg, params)

    rng = np.random.RandomState(0)
    codes = rng.randint(0, card, size=(1, K, chunk), dtype=np.int64)
    shifted = np.zeros((1, K, chunk), np.int32)
    shifted[:, :, 1:] = 1 + codes[:, :, :-1]

    big_exec = lm.chunk_exec(1, K, chunk)
    pr_big, _ = big_exec(lm.params, jnp.asarray(shifted), lm.init_stream(1))
    pr_big = np.asarray(pr_big)          # [1, card, K, chunk]
    print(f"chunk executable done ({time.time()-t0:.0f}s)", flush=True)

    # pair-executable stepping, exactly as _lockstep_decode_fast does it
    pair_exec = lm.chunk_exec(1, K, 2)
    pstate = lm.init_stream(1)
    pr_pair = np.zeros_like(pr_big)
    pair_in = np.zeros((1, K, 2), np.int32)
    for t0_ in range(0, chunk, 2):
        pair_in[:] = 0
        pair_in[:, :, 0] = shifted[:, :, t0_]
        probas, _ = pair_exec(lm.params, jnp.asarray(pair_in), pstate)
        pr_pair[..., t0_] = np.asarray(probas)[..., 0]
        pair_in[:, :, 1] = shifted[:, :, t0_ + 1]
        probas, pstate = pair_exec(lm.params, jnp.asarray(pair_in), pstate)
        pr_pair[..., t0_ + 1] = np.asarray(probas)[..., 1]
    print(f"pair stepping done ({time.time()-t0:.0f}s)", flush=True)

    diff = pr_big != pr_pair
    per_token = diff.reshape(-1, chunk).sum(0)
    n_diff = int(diff.sum())
    print(f"bitwise-differing probability elements: {n_diff}/{diff.size} "
          f"({100.0*n_diff/diff.size:.3f}%)")
    if n_diff:
        first_t = int(np.nonzero(per_token)[0][0])
        print(f"first differing token: {first_t}; tokens affected: "
              f"{int((per_token > 0).sum())}/{chunk}")
        ad = np.abs(pr_big - pr_pair)
        print(f"max |delta|: {ad.max():.3e}  at p={pr_big.flat[ad.argmax()]:.3e}")
        a = pr_big.view(np.int32).astype(np.int64)
        b = pr_pair.view(np.int32).astype(np.int64)
        ulp = np.abs(a - b)[diff]
        print(f"ulp distance: max {int(ulp.max())}, mean {ulp.mean():.2f}")

    # the decisive check: quantized CDF rows
    rows_exec = lm.batch_cdf_row_exec()
    rows_diff = 0
    rows_bad = 0
    worst = 0
    for t in range(chunk):
        rb, bad_b, _ = rows_exec(jnp.asarray(pr_big), t)
        rp, bad_p, _ = rows_exec(jnp.asarray(pr_pair), t)
        rows_bad += int(np.asarray(bad_b)) + int(np.asarray(bad_p))
        d = int((np.asarray(rb) != np.asarray(rp)).sum())
        rows_diff += d
        worst = max(worst, d)
    verdict = ("PASS — CDF roundoff absorbs the drift" if rows_diff == 0
               else "FAIL — drift exceeds roundoff")
    print(f"quantized CDF rows: {rows_diff} differing integers over "
          f"{chunk}x{K}x{card} ({verdict}); bad={rows_bad}")
    print(f"DONE in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
