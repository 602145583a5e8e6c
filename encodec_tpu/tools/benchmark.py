"""Stage benchmark: encode / LM / entropy-coding / decode timings.

Behavioral reference: benchmark.py at the reference root — times encode,
the full-sequence LM evaluation, AC encode/decode and decode on ~10 s of
audio at 12 kbps. Here the LM sweep is the batched TPU path
(`lm.forward_batch`) and the codec stages run jitted; the AC loop is the
host-side range coder.

Run: python -m encodec_tpu.tools.benchmark [--seconds 10] [--bandwidth 12]
Prints one JSON dict of stage timings + realtime factors.
"""

from __future__ import annotations

import io
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def warm_tunnel(max_seconds: float = 300.0,
                steady_call_s: float = 0.25) -> None:
    """Run a small jitted op until latency reaches steady state — a cold
    tunnel/backend serves a process's first executions orders of magnitude
    slower than steady state (measured ~7 s/call on a 45 ms graph for the
    first ~2-3 minutes after idle; the warmth persists server-side across
    processes). Timing anything before this settles under-reports by
    orders of magnitude. Shared by every benchmark (repo-root bench.py
    imports it)."""
    import numpy as np
    tick = jax.jit(lambda v: (v * 1.000001 + 1.0).sum())
    v = jnp.ones((256, 256), jnp.float32)
    np.asarray(tick(v))
    deadline = time.perf_counter() + max_seconds
    good = 0
    while time.perf_counter() < deadline:
        t0 = time.perf_counter()
        np.asarray(tick(v))
        good = good + 1 if time.perf_counter() - t0 < steady_call_s else 0
        if good >= 5:
            return


_warm_tunnel = warm_tunnel  # back-compat alias


def bench(model, lm=None, seconds: float = 10.0, bandwidth: float = 12.0,
          iters: int = 5) -> dict:
    _warm_tunnel()
    sr = model.sample_rate
    model.set_target_bandwidth(bandwidth)
    T = int(seconds * sr)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, model.channels, T))

    def timed(fn, *args):
        out = fn(*args)  # compile + warmup
        jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            # serialize every iteration — async dispatch through a device
            # tunnel under-reports otherwise (see BENCH.md)
            jax.block_until_ready(jax.tree.leaves(out))
        return out, (time.perf_counter() - t0) / iters

    frames, t_enc = timed(model.encode, x)
    out, t_dec = timed(model.decode, frames)
    results = {
        "seconds": seconds,
        "bandwidth_kbps": bandwidth,
        "encode_s": t_enc,
        "encode_rtf": seconds / t_enc,
        "decode_s": t_dec,
        "decode_rtf": seconds / t_dec,
    }

    if lm is not None:
        codes = frames[0][0]                          # [1, K, T']
        K, Tq = codes.shape[1], codes.shape[2]
        shifted = jnp.concatenate(
            [jnp.zeros((1, K, 1), codes.dtype), 1 + codes[:, :, :-1]], axis=2)
        probas, t_lm = timed(lambda s: lm.forward_batch(s), shifted)
        results["lm_batched_s"] = t_lm
        results["lm_tokens_per_s"] = K * Tq / t_lm

        from ..stream.ac import (ArithmeticCoder, ArithmeticDecoder,
                                 build_stable_quantized_cdf)
        p = np.asarray(probas)
        cn = np.asarray(codes[0])
        t0 = time.perf_counter()
        fo = io.BytesIO()
        coder = ArithmeticCoder(fo)
        for t in range(Tq):
            for k in range(K):
                cdf = build_stable_quantized_cdf(p[0, :, k, t],
                                                 coder.total_range_bits,
                                                 check=False)
                coder.push(int(cn[k, t]), cdf)
        coder.flush()
        results["ac_encode_s"] = time.perf_counter() - t0
        results["ac_bytes"] = len(fo.getvalue())
        t0 = time.perf_counter()
        fo.seek(0)
        dec = ArithmeticDecoder(fo)
        for t in range(Tq):
            for k in range(K):
                cdf = build_stable_quantized_cdf(p[0, :, k, t],
                                                 dec.total_range_bits,
                                                 check=False)
                dec.pull(cdf)
        results["ac_decode_s"] = time.perf_counter() - t0
    return results


def main():
    from ..utils import honor_platform_env
    honor_platform_env()
    import argparse
    from ..models.model import build_model

    parser = argparse.ArgumentParser("encodec_tpu.tools.benchmark")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--bandwidth", type=float, default=12.0)
    parser.add_argument("--lm", action="store_true",
                        help="include LM + AC stages (random-weight LM)")
    args = parser.parse_args()

    model = build_model([1.5, 3., 6., 12., 24.], sample_rate=24_000,
                        channels=1, causal=True, model_norm="weight_norm",
                        name="encodec_24khz", ratios=[8, 5, 4, 2], bins=1024,
                        dimension=128)
    lm = None
    if args.lm:
        from ..models.lm import LMConfig, LMModel, init_lm
        cfg = LMConfig(n_q=32, card=1024, past_context=int(3.5 * 75))
        lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    print(json.dumps(bench(model, lm, args.seconds, args.bandwidth),
                     indent=None))


if __name__ == "__main__":
    main()
