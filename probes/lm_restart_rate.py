"""Rate cost of `lm_restart` blocks vs block length, on a TRAINED LM.

`lm_restart=R` (stream/compress.py) resets the LM prior and flushes the
range coder every R tokens so the decoder can run all blocks in lockstep
through one batched executable (the measured decode lever: 0.772 ->
0.241 ms/token/stream at S=16, probes/ilm_lockstep.py). The cost is two
small rate regressions per block:

  1. coder flush + byte alignment (~2-3 bytes/block), plus ~5 bytes of
     "fl" length metadata per block in the header;
  2. the prior loses its context at block starts — tokens early in each
     block are coded at higher entropy until the context window refills.

This probe quantifies both on an LM *trained* to exploit context:
FIXED per-codebook periodic patterns (memorizable) sampled at a random
phase per sequence, under 35% substitution noise — the model must
integrate several context tokens to localize the phase, so the first
~tens of tokens after every reset are genuinely more expensive, the
same shape as a real acoustic-token prior (most predictive information
is local; gains saturate well inside past_context). Random-init LMs are
useless here — near-uniform priors make restarts cost ~nothing — and
per-sequence random patterns are the opposite failure: an induction
task the LM cannot learn in a probe budget, which also trains to
uniform. The pretrained-zoo LM would be the gold measurement; it is
environment-blocked (no egress), recorded in PARITY_REPORT.json.

Output: bytes + overhead %% vs no-restart for a 60 s (T=4500) stream at
R in {None, 2250, 1125, 750, 375, 188}, and the implied lockstep lane
count S = ceil(T/R). Pairs with probes/ilm_lockstep.py's ms/token-vs-S
curve to pick the CLI default (verdict r4 #4).

Usage: timeout 2400 python probes/lm_restart_rate.py [--cpu] [--steps N]
"""
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

K = 8
CARD = 1024
T_EVAL = 4500          # 60 s @ 75 Hz
PERIOD = 128           # < past_context: the LM can learn to copy lag-P
R_GRID = (None, 2250, 1125, 750, 375, 188)


_PATTERN = np.random.RandomState(1234).randint(
    0, CARD, size=(K, PERIOD))          # fixed, memorizable


def _codes(rng, B, T):
    """Fixed per-codebook period-PERIOD patterns at a random phase per
    sequence + 35% substitution noise. Predicting token t requires
    knowing the phase; under heavy noise a single context token is
    unreliable, so the prior needs several tokens after a reset before
    its predictions sharpen — a graded, measurable warmup cost."""
    phase = rng.randint(0, PERIOD, size=(B, 1, 1))
    idx = (phase + np.arange(T)[None, None, :]) % PERIOD
    seq = np.take_along_axis(
        np.broadcast_to(_PATTERN[None], (B, K, PERIOD)), idx, axis=2)
    noise = rng.randint(0, CARD, size=(B, K, T))
    mask = rng.rand(B, K, T) < 0.35
    return np.where(mask, noise, seq).astype(np.int32)


def main():
    import jax.numpy as jnp
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.models.ilm import IntLMModel
    from encodec_tpu.stream.compress import _encode_lockstep_streams
    from encodec_tpu.train.lm_train import (create_lm_train_state,
                                            make_lm_train_step)

    steps = 300
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = LMConfig(n_q=K, card=CARD, dim=200, num_heads=8, num_layers=5,
                   past_context=262)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    opt, opt_state = create_lm_train_state(params, lr=1e-3)
    step = make_lm_train_step(cfg, opt)

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for i in range(steps):
        batch = jnp.asarray(_codes(rng, 4, 384))
        params, opt_state, metrics = step(params, opt_state, batch)
        if i % 25 == 0 or i == steps - 1:
            print(f"step {i:4d}  bits/code "
                  f"{float(metrics['bits_per_code']):.3f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    bits = float(metrics["bits_per_code"])
    # phase-known floor: H(noise flag) + P(noise)*log2(card)
    floor = (-(0.35 * np.log2(0.35) + 0.65 * np.log2(0.65))
             + 0.35 * np.log2(CARD))
    print(f"trained: {bits:.3f} bits/code (uniform = {np.log2(CARD):.1f}; "
          f"phase-known floor ~= {floor:.2f})", flush=True)

    ilm = IntLMModel.from_lm(LMModel(cfg, params))
    held = _codes(np.random.RandomState(99), 1, T_EVAL)[0]    # [K, T]

    results = []
    for R in R_GRID:
        if R is None:
            blocks = [held]
        else:
            blocks = [held[:, i:i + R] for i in range(0, T_EVAL, R)]
        streams = _encode_lockstep_streams(ilm, blocks)
        payload = sum(len(s) for s in streams)
        # header cost of the per-block "fl" length list (~5-6 bytes/block
        # of JSON); None writes no list
        meta = 0 if R is None else len(f'"lmb":{R},"fl":') + sum(
            len(str(len(s))) + 1 for s in streams)
        results.append((R, len(streams), payload + meta))
    base = results[0][2]
    print(f"\n{'R':>6} {'S lanes':>8} {'bytes':>8} {'overhead':>9} "
          f"{'bits/code':>10}", flush=True)
    for R, S, total in results:
        print(f"{str(R):>6} {S:>8} {total:>8} "
              f"{100.0 * (total - base) / base:>8.2f}% "
              f"{8.0 * total / (K * T_EVAL):>10.3f}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
