"""TPU probe: on-chip smoke of the round-3 review-fix surfaces.

Drives, on the real chip: full-size 24 kHz encode/decode at 'highest' and
'high' (the encoder VPU-shift route), streamed==batch codes in both modes
(the lowering plumbing), and an LM .ecdc roundtrip through the delegated
S=1 decode tiers + the fused device tier. Prints PASS/FAIL lines only —
no perf claims (see BENCH.md methodology for timing rules).
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

    from encodec_tpu.models import encodec_model_24khz
    from encodec_tpu.models.streaming import StreamingCodec
    from encodec_tpu.models.lm import LMModel, LMConfig, init_lm
    from encodec_tpu.stream import compress, decompress
    import importlib
    cmod = importlib.import_module("encodec_tpu.stream.compress")

    m = encodec_model_24khz(pretrained=False)
    m.set_target_bandwidth(6.0)
    x = np.random.RandomState(0).randn(1, 1, 24000).astype(np.float32) * 0.2

    codes_hi = np.asarray(m.encode(jnp.asarray(x))[0][0])
    print(f"encode highest ok ({time.time()-t0:.0f}s)", flush=True)
    m.set_precision("high")
    codes_h = np.asarray(m.encode(jnp.asarray(x))[0][0])
    flips = int((codes_hi != codes_h).sum())
    print(f"high-mode flips on chip: {flips}/{codes_hi.size} "
          f"({'PASS' if flips == 0 else 'CHECK'})", flush=True)

    # streaming == batch codes at 'high' (lowering plumbing, on-chip)
    hop = m.cfg.seanet.hop_length
    T = hop * 24 + 7
    xs = np.random.RandomState(1).randn(1, 1, T).astype(np.float32) * 0.2
    for mode in ("high", "highest"):
        m.set_precision(mode)
        off = np.asarray(m.encode(jnp.asarray(xs))[0][0])
        sc = StreamingCodec(m)
        c = [np.asarray(sc.encode_chunk(xs[:, :, :hop * 12])),
             np.asarray(sc.encode_chunk(xs[:, :, hop * 12:hop * 24])),
             np.asarray(sc.encode_finish(xs[:, :, hop * 24:]))]
        eq = bool((np.concatenate(c, -1) == off).all())
        print(f"stream==batch codes @ {mode}: {'PASS' if eq else 'FAIL'}",
              flush=True)

    # LM roundtrip through the delegated tiers + fused device tier
    m.set_precision("highest")
    reg = {m.name: (lambda pretrained=True: m)}
    cfg = LMConfig(n_q=m.cfg.rvq.n_q, card=m.cfg.rvq.bins, dim=32,
                   num_layers=1, past_context=40)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    data = compress(m, x[0], use_lm=True, lm=lm, models=reg)
    wav_dev, _ = decompress(data, models=reg, lm=lm)      # device tier
    # force the host tiers once each to prove they also decode this stream
    wav_ref = np.asarray(wav_dev)
    import unittest.mock as mock
    with mock.patch.object(cmod, "_decode_frame_lm_device",
                           side_effect=cmod.LMScheduleMismatch("forced")):
        wav_fast, _ = decompress(data, models=reg, lm=lm)
    ok_fast = bool(np.array_equal(np.asarray(wav_fast), wav_ref))
    with mock.patch.object(cmod, "_decode_frame_lm_device",
                           side_effect=cmod.LMScheduleMismatch("forced")), \
         mock.patch.object(cmod, "_decode_frame_lm_fast",
                           side_effect=cmod.LMScheduleMismatch("forced")):
        wav_safe, _ = decompress(data, models=reg, lm=lm)
    ok_safe = bool(np.array_equal(np.asarray(wav_safe), wav_ref))
    print(f"LM roundtrip tiers agree: device/fast/safe "
          f"{'PASS' if ok_fast and ok_safe else 'FAIL'}", flush=True)
    print(f"RECHECK DONE in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
