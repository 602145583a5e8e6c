"""Lockstep-batching throughput of the lmv=3 integer-LM codec (real chip).

BENCH.md claims lockstep batching is the production throughput lever for
the integer entropy codec (per-token cost is dominated by a per-scan-
iteration floor, so S streams in one scan cost ~one stream's wall
time). Quantify it: encode-side CDF bounds and the fused device decode
(`stream.compress._lockstep_decode_int`) at S = 1, 4, 16 independent
10 s streams, true LM size (5 layers, dim 200, W=262, card 1024).

Usage: timeout 2400 python probes/ilm_lockstep.py [--cpu]
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

K = 8          # codebooks at 6 kbps
T = 750        # tokens per stream (10 s @ 75 Hz)
SIZES = (1, 4, 16)


def main():
    from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
    from encodec_tpu.models.ilm import IntLMModel
    from encodec_tpu.stream import ac as ac_mod
    from encodec_tpu.stream.compress import _lockstep_decode_int

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = LMConfig(n_q=K, card=1024, dim=200, num_heads=8, num_layers=5,
                   past_context=262)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    ilm = IntLMModel.from_lm(lm)

    rng = np.random.RandomState(0)
    codes = [rng.randint(0, cfg.card, size=(K, T)).astype(np.int64)
             for _ in range(max(SIZES))]

    # host-encode each stream once (the writer path)
    datas = []
    for c in codes:
        (lows, highs), = ilm.codec_symbol_bounds_batched([c])
        import io
        fo = io.BytesIO()
        coder = ac_mod.ArithmeticCoder(fo)
        for lo, hi in zip(lows, highs):
            coder.push_bounds(int(lo), int(hi))
        coder.flush()
        datas.append(fo.getvalue())
    print(f"streams: {len(datas)} x {len(datas[0])} bytes", flush=True)

    def timed(fn, reps=4):
        fn()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'S':>3} {'bounds ms/tok/stream':>22} {'decode ms/tok/stream':>22}",
          flush=True)
    for S in SIZES:
        tb = timed(lambda: ilm.codec_symbol_bounds_batched(codes[:S]))
        td = timed(lambda: _lockstep_decode_int(
            datas[:S], ilm, K, [T] * S))
        print(f"{S:>3} {1e3 * tb / (S * T):>22.4f} "
              f"{1e3 * td / (S * T):>22.4f}", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
