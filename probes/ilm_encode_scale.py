"""Component profile of the ILM lockstep ENCODE path (VERDICT r4 #6).

probes/ilm_lockstep.py showed bounds-encode flattening at ~0.27
ms/token/stream from S=4 while fused decode kept improving to S=16.
BENCH.md attributed the flattening to "host range coder + transfers";
decide it by measurement. Per S in {1, 4, 16}, time each component of
`IntLMModel.codec_symbol_bounds_batched` (T=750, K=8, true LM size):

  device   the chunked ILM sweep alone, result reduced to ONE scalar
           fetched per iteration (no bounds materialization) — the
           irreducible device compute;
  bounds   the full codec_symbol_bounds_batched (sweep + int64 bounds
           device->host transfers + numpy reshaping);
  coder    native C++ range coding of precomputed bounds (the only
           host-serial stage);
  e2e      _encode_lockstep_streams (everything).

If `device` tracks `bounds`, the scan-body compute is the floor and
double-buffering host coding under device compute buys nothing; if
`bounds` >> `device`, the transfer/sync layout is the lever.

Usage: timeout 2400 python probes/ilm_encode_scale.py [--cpu]
"""
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

K = 8
T = 750
SIZES = (1, 4, 16)


def timed(fn, reps=4):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from encodec_tpu import native
    from encodec_tpu.models.ilm import IntLMModel, carry_from_state
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.stream.compress import _encode_lockstep_streams

    print("platform:", jax.devices()[0].platform,
          "native:", native.available(), flush=True)
    cfg = LMConfig(n_q=K, card=1024, dim=200, num_heads=8, num_layers=5,
                   past_context=262)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    ilm = IntLMModel.from_lm(lm)
    chunk = ilm.CODEC_CHUNK
    n_chunks = -(-T // chunk)
    Tp = n_chunks * chunk

    rng = np.random.RandomState(0)
    codes = [rng.randint(0, cfg.card, size=(K, T)).astype(np.int64)
             for _ in range(max(SIZES))]

    hdr = (f"{'S':>3} {'device':>10} {'bounds':>10} {'coder':>10} "
           f"{'e2e':>10}   (ms/token/stream)")
    print(hdr, flush=True)
    for S in SIZES:
        shifted = np.zeros((S, K, Tp), np.int32)
        symbols = np.zeros((S, K, Tp), np.int32)
        for s in range(S):
            shifted[s, :, 1:T] = 1 + codes[s][:, :T - 1]
            symbols[s, :, :T] = codes[s]
        exec_ = ilm.chunk_exec(S, K, chunk)
        bounds_ = ilm.bounds_exec()
        sh_dev = jnp.asarray(shifted)
        sy_dev = jnp.asarray(symbols)

        def device_only():
            carry = carry_from_state(ilm.init_stream(batch=S))
            acc = None
            for ci in range(n_chunks):
                sl = jax.lax.slice_in_dim(sh_dev, ci * chunk,
                                          (ci + 1) * chunk, axis=2)
                cdf, carry = exec_(ilm.iparams, sl, carry)
                lo, hi = bounds_(cdf, jax.lax.slice_in_dim(
                    sy_dev, ci * chunk, (ci + 1) * chunk, axis=2))
                s_ = jnp.sum(lo) + jnp.sum(hi)
                acc = s_ if acc is None else acc + s_
            return int(acc)  # one scalar fetch — waits, ~4 bytes

        t_dev = timed(device_only)
        t_bounds = timed(
            lambda: ilm.codec_symbol_bounds_batched(codes[:S]))
        pre = ilm.codec_symbol_bounds_batched(codes[:S])

        def coder_only():
            for lows, highs in pre:
                native.encode_bounds(lows, highs)

        t_coder = timed(coder_only) if native.available() else float("nan")
        t_e2e = timed(lambda: _encode_lockstep_streams(ilm, codes[:S]))

        den = S * T / 1e3
        print(f"{S:>3} {t_dev / den:>10.4f} {t_bounds / den:>10.4f} "
              f"{t_coder / den:>10.4f} {t_e2e / den:>10.4f}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
