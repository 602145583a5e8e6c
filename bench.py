"""Driver benchmark: one JSON line, primary metric + a panel of extras.

Primary (top-level fields, format the driver expects):
  encode_rtf_24khz — batched 24 kHz encode (SEANet encoder + RVQ @ 6 kbps),
  B=32 x 1 s, f32, vs the BASELINE.md target of >= 200x realtime.

Extras (in "extra_metrics"): decode RTF, 48 kHz segmented encode+decode
roundtrip RTF (fused single-dispatch decode), the production
breathing-tokenizer train step, LM entropy-codec encode AND decode rates,
real-time streaming step latency (one hop, steady state),
graceful-preemption checkpoint latency, the measured tunnel RTT, and the
encode path's fraction of the HBM memory roofline (RTT-corrected). Every
tunnel_bound metric that a reader could misread as a regression carries an
`rtt_corrected_value` companion.

Methodology note (also embedded in the JSON): every iteration is
`block_until_ready`-serialized and the run ends with a host
materialization. In this environment the chip sits behind a network tunnel
with ~50 ms host<->device RTT and limited copy bandwidth, so any number
that syncs or copies per step is tunnel-bound, not compute-bound: the same
encode measures ~2,300x realtime when only end-synced on chip (BENCH.md)
but ~700x when serialized through the tunnel each step — that gap is the
tunnel, not the kernel. Numbers flagged "tunnel_bound" improve by ~2
orders of magnitude on a locally attached TPU.
"""

import json
import os
import sys
import time

_IMPORT_T0 = time.perf_counter()


_BEAT = {"t": None}


def _beat() -> None:
    """Measurement-progress heartbeat for the worker stall watchdog."""
    _BEAT["t"] = time.monotonic()


class _Phases:
    """Per-section phase timer: stderr breadcrumbs showing where a
    metric subprocess spends its wall time (import/init, tunnel warmup,
    each compile, the timing loop). Purely diagnostic — lets a panel
    reader attribute section cost to remote compiles vs. measurement."""

    def __init__(self) -> None:
        self.t = time.perf_counter()
        _beat()

    def mark(self, label: str) -> None:
        now = time.perf_counter()
        print(f"[bench]   {label}: {now - self.t:.1f}s",
              file=sys.stderr, flush=True)
        self.t = now
        _beat()

import jax
import jax.numpy as jnp

# NO persistent compilation cache here: on the tunneled axon TPU backend,
# executables reloaded from the on-disk cache have been observed to run
# pathologically slowly (25-100x on the encode graph; likely the
# client-vs-terminal libtpu build mismatch the backend warns about), while
# fresh jit compiles are fine. Cold compiles cost ~20-60 s per graph, which
# the warmup iterations absorb. The CPU test harness keeps its cache
# (tests/conftest.py).


from encodec_tpu.tools.benchmark import warm_tunnel as _warm_tunnel  # noqa: E402

# BENCH_SMOKE=1: tiny shapes + forced-CPU — validates the whole panel and
# the subprocess orchestration in seconds (CI / no-TPU environments). The
# numbers it prints are meaningless; the JSON SHAPE is the contract
# (tests/test_bench_contract.py runs exactly this mode).
SMOKE = bool(os.environ.get("BENCH_SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
    # Smoke mode keeps the persistent CPU compile cache (the no-cache rule
    # above is about the tunneled TPU backend only) so the contract test
    # re-runs in seconds.
    try:
        from encodec_tpu.utils.cache import guard_cache_host_fingerprint
        _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  ".jax_cache")
        guard_cache_host_fingerprint(_cache_dir)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_PICK = None


def _timed(fn, *args, iters=10):
    """Serialized timing: every iteration ends with a single-element fetch
    through a jitted reduction (4-byte transfer). On this tunneled backend
    `block_until_ready` alone can return before execution finishes
    (observed: a T=750 LSTM scan "measured" at 0.02 ms), and materializing
    a full output pays the tunnel's ~30 MB/s copy bandwidth — a scalar
    fetch is the only probe that both waits correctly and costs one RTT
    (subtracted by the callers' rtt_corrected companions)."""
    import numpy as np
    global _PICK
    if _PICK is None:
        _PICK = jax.jit(lambda y: y.ravel()[0])

    def sync(out):
        v = float(np.asarray(_PICK(jax.tree.leaves(out)[0])))
        _beat()
        return v

    sync(fn(*args))  # compile + warmup (incl. the pick executable)
    for _ in range(3):
        sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed_pipelined(fn, n=20):
    """Pipelined-THROUGHPUT timing: dispatch `n` back-to-back iterations
    and sync ONCE on a single-element fetch of the last result. On TPU a
    single execution stream runs programs in dispatch order, so when the
    final scalar is readable every earlier iteration has necessarily
    finished — total wall / n is true sustained throughput, with the one
    tunnel RTT amortized over all n. This is the measured companion to
    the serialized `_timed` (latency) number and to the arithmetic
    rtt_corrected companions: a direct measurement, not a correction.
    All operands must already be device-resident (dispatches then carry
    only buffer handles, so sends pipeline through the tunnel)."""
    import numpy as np
    global _PICK
    if _PICK is None:
        _PICK = jax.jit(lambda y: y.ravel()[0])

    def sync(out):
        v = float(np.asarray(_PICK(jax.tree.leaves(out)[0])))
        _beat()
        return v

    sync(fn())  # warm (compile already done by callers; drains the queue)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


_RTT_CACHE = {}


def measure_rtt() -> float:
    """Per-dispatch host<->device round-trip: a trivial jitted op, blocked
    every call. Subtracted from per-step-synced timings to report their
    RTT-corrected companions (VERDICT r2 weak #1)."""
    if "rtt" not in _RTT_CACHE:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((), jnp.float32)
        jax.block_until_ready(f(x))
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        _RTT_CACHE["rtt"] = best
    return _RTT_CACHE["rtt"]


def bench_24k_codec():
    from encodec_tpu.models.model import (build_model, decode_frame,
                                          encode_frame)

    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
        causal=True, model_norm="weight_norm", name="encodec_24khz",
        ratios=[8, 5, 4, 2], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 128,
        n_filters=8 if SMOKE else 32)
    cfg = model.cfg
    B, T = (2, 2_400) if SMOKE else (32, 24_000)

    encode = jax.jit(lambda p, q, x: encode_frame(p, q, x, cfg, n_q=8))
    decode = jax.jit(lambda p, q, c: decode_frame(p, q, c, cfg, None))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 1), jnp.float32)

    ph = _Phases()
    # AOT-compile once and time the compiled executable directly — the
    # same artifact then serves the cost analysis below (jit dispatch and
    # .lower().compile() would otherwise each pay a remote compile)
    encode_c = encode.lower(model.params, model.qstate, x).compile()
    ph.mark("encode AOT compile")
    iters = 2 if SMOKE else 10
    t_enc = _timed(lambda: encode_c(model.params, model.qstate, x),
                   iters=iters)
    ph.mark("encode timing loop")
    t_thr = _timed_pipelined(
        lambda: encode_c(model.params, model.qstate, x),
        n=3 if SMOKE else 20)
    ph.mark("encode pipelined-throughput loop")
    codes, _ = encode_c(model.params, model.qstate, x)
    t_dec = _timed(lambda: decode(model.params, model.qstate, codes),
                   iters=iters)
    t_dec_thr = _timed_pipelined(
        lambda: decode(model.params, model.qstate, codes),
        n=3 if SMOKE else 20)
    ph.mark("decode compile+timing")

    audio_seconds = B * T / 24_000
    # Pipelined time is a direct device-time measurement (no RTT
    # arithmetic), so the roofline fraction computed from it is stable
    # across tunnel weather; the serialized time minus a separately
    # measured RTT drifted 0.42-0.69 run to run on the same graph.
    roofline = _roofline(encode_c, t_thr, subtract_rtt=False)
    ph.mark("roofline/cost_analysis")
    return (audio_seconds / t_enc, audio_seconds / t_dec, roofline,
            audio_seconds / t_thr, audio_seconds / t_dec_thr)


def _roofline(compiled, t_meas, subtract_rtt=True):
    """Roofline fraction: the encode graph is HBM-bound (small matmuls,
    big activations), so the honest utilization number is the analytic
    bytes-accessed divided by the v5e HBM bandwidth (819 GB/s) — the
    memory-floor time — over the RTT-corrected measured time. (The old
    `encode_mfu_estimate` divided FLOPs by the f32 peak on a graph that
    cannot be FLOP-bound and read like a 100x regression.)

    HIGHEST's residual vs its floor is NOT bytes: the per-stage breakdown
    (probes/encoder.py, BENCH.md round-4) shows the small-channel head
    stages (C<=64 underfills the 128-lane MXU) running the 6-pass f32
    emulation — a compute-shape bound pinned by bit-parity semantics."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        nbytes = float(cost.get("bytes accessed", 0.0))
        if nbytes > 0:
            t_floor = nbytes / 819e9
            rtt = measure_rtt() if subtract_rtt else 0.0
            return t_floor / max(t_meas - rtt, t_floor)
    except Exception:
        pass
    return None


def bench_24k_encode_high():
    """Audited reduced-precision encode: 3-pass bf16 MXU emulation + the
    VPU shift lowering for the encoder head's tiny-channel convs —
    flip-free at every served bandwidth on the full-size models
    (tests/margin_audit.py audit_precision); 'highest' stays the bit-exact
    parity default and the primary metric. Runs in a LATE slot: it costs a
    third remote AOT compile and the primary/train metrics must land
    first (VERDICT r4 #1c)."""
    from encodec_tpu.models.model import build_model, encode_frame

    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
        causal=True, model_norm="weight_norm", name="encodec_24khz",
        ratios=[8, 5, 4, 2], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 128,
        n_filters=8 if SMOKE else 32)
    cfg = model.cfg
    B, T = (2, 2_400) if SMOKE else (32, 24_000)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 1), jnp.float32)
    encode_high = jax.jit(lambda p, q, x: encode_frame(
        p, q, x, cfg, n_q=8, precision=jax.lax.Precision.HIGH,
        lowering="auto"))
    encode_high_c = encode_high.lower(model.params, model.qstate,
                                      x).compile()
    iters = 2 if SMOKE else 10
    t_enc_high = _timed(lambda: encode_high_c(model.params, model.qstate, x),
                        iters=iters)
    t_thr_high = _timed_pipelined(
        lambda: encode_high_c(model.params, model.qstate, x),
        n=3 if SMOKE else 20)
    audio_seconds = B * T / 24_000
    return (audio_seconds / t_enc_high,
            _roofline(encode_high_c, t_thr_high, subtract_rtt=False),
            audio_seconds / t_thr_high)


def bench_48k_roundtrip():
    """Segmented (1 s segments, 1% overlap) stereo encode+decode at 24 kbps
    with per-segment normalization — the 48 kHz production pipeline."""
    from encodec_tpu.models.model import build_model

    model = build_model(
        [3.0, 6.0, 12.0, 24.0], sample_rate=48_000, channels=2,
        causal=False, model_norm="time_group_norm", name="encodec_48khz",
        ratios=[8, 5, 4, 2], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 128, n_filters=8 if SMOKE else 32,
        audio_normalize=True, segment=1.0)
    model.set_target_bandwidth(24.0)
    seconds = 2.2 if SMOKE else 10.0
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 2, int(seconds * 48_000))) * 0.2

    def roundtrip():
        return model.decode(model.encode(x))

    ph = _Phases()
    t_rt = _timed(roundtrip, iters=1 if SMOKE else 5)
    ph.mark("highest compile+timing")
    # audited reduced-precision mode (tests/margin_audit.py
    # audit_precision: flip-free at every served bandwidth on the
    # full-size models; 'highest' stays the parity default)
    model.set_precision("high")
    t_rt_high = _timed(roundtrip, iters=1 if SMOKE else 5)
    model.set_precision("highest")
    ph.mark("high compile+timing")
    t_rt_thr = _timed_pipelined(roundtrip, n=2 if SMOKE else 10)
    ph.mark("pipelined-throughput loop")
    return seconds / t_rt, seconds / t_rt_high, seconds / t_rt_thr


def bench_train_step():
    """Production breathing-tokenizer generator step: dim 256, ratios
    [6,5,5,2,1] (300x downsample), bins 1024, batch 8 x 4 h @ 10 Hz,
    per-stage remat — the round-1 BENCH.md configuration (generator losses
    incl. spectrogram reconstruction; no discriminator, to stay comparable
    with the round-1 baseline. The full GAN step also fits one chip with
    the chunk-scanned discriminator: 2.43 s gen + 1.68 s disc at this
    shape — see BENCH.md)."""
    import dataclasses
    import numpy as np
    from encodec_tpu.models.model import build_model
    from encodec_tpu.train import (LossWeights, create_train_state,
                                   make_train_steps)

    model = build_model(
        [0.08], sample_rate=10, channels=1, causal=True,
        model_norm="layer_norm", name="breathing_model",
        ratios=[6, 5, 5, 2, 1], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 256, n_filters=8 if SMOKE else 32,
        decoder_final_norm="none", shared_codebook=True)
    seanet = dataclasses.replace(model.cfg.seanet, remat=True)
    model.cfg = dataclasses.replace(model.cfg, seanet=seanet)
    _ph_train = _Phases()
    state, _, _ = create_train_state(model, None, seed=0)
    _ph_train.mark("create_train_state")
    gen_step, _, _, _ = make_train_steps(
        model.cfg, None, freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
    weights = LossWeights.make(lr=3e-4)
    bsz, blen = (1, 6_000) if SMOKE else (8, 144_000)
    batch = jnp.asarray(
        np.random.RandomState(0).randn(bsz, blen, 1), jnp.float32)

    def measure(gen_step_fn, st):
        st, metrics = gen_step_fn(st, batch, weights, use_gan=False)
        jax.block_until_ready(metrics["loss"])
        _ph_train.mark("step compile+first call")
        iters = 1 if SMOKE else 5
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = gen_step_fn(st, batch, weights, use_gan=False)
            jax.block_until_ready(metrics["loss"])
        float(metrics["loss"])
        _ph_train.mark("timing loop")
        return (time.perf_counter() - t0) / iters

    t_f32 = measure(gen_step, state)
    gen_bf16, *_ = make_train_steps(
        model.cfg, None, compute_dtype=jnp.bfloat16,
        freq_loss_kwargs=dict(n_fft=512, sampling_rate=10))
    t_bf16 = measure(gen_bf16, state)
    return t_f32, t_bf16


def bench_lm_encode():
    """LM entropy-codec encode rate at production 24 kHz shapes (5 layers,
    dim 200, K=8, card 1024, past_context 262): pinned chunk scan +
    device-built CDF bounds (stream/device_cdf)."""
    import numpy as np
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm

    cfg = LMConfig(n_q=8, card=64 if SMOKE else 1024,
                   dim=32 if SMOKE else 200, num_layers=2 if SMOKE else 5,
                   past_context=262)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    K, T = (8, 64) if SMOKE else (8, 750)  # 10 s of 24 kHz at 75 Hz
    codes = np.random.RandomState(0).randint(
        0, cfg.card, (K, T)).astype(np.int64)
    ph = _Phases()
    lm.codec_symbol_bounds(codes)  # compile
    ph.mark("bounds compile+first call")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        lm.codec_symbol_bounds(codes)
        best = min(best, time.perf_counter() - t0)
    ph.mark("timing loop")
    return 1e3 * best / T  # ms per token


def bench_lm_decode():
    """LM entropy-codec DECODE rate on the decode-designed container
    layout (lm_restart blocks in lockstep): the fused on-device path (LM
    cell + CDF build + range decode in one scan per chunk, canonical
    checksum verified) decoding R-token blocks in lockstep lanes. 10 s of
    24 kHz audio, K=8."""
    import importlib
    import numpy as np
    compress_mod = importlib.import_module("encodec_tpu.stream.compress")
    from encodec_tpu import native
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.stream.ac import ArithmeticCoder

    cfg = LMConfig(n_q=8, card=64 if SMOKE else 1024,
                   dim=32 if SMOKE else 200, num_layers=2 if SMOKE else 5,
                   past_context=262)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    K, T, R = (8, 64, 32) if SMOKE else (8, 750, 125)
    codes = np.random.RandomState(0).randint(
        0, cfg.card, (K, T)).astype(np.int64)
    blocks = [codes[:, i:i + R] for i in range(0, T, R)]
    Ts = [b.shape[1] for b in blocks]
    datas = []
    for lows, highs in lm.codec_symbol_bounds_batched(blocks):
        if native.available():
            datas.append(native.encode_bounds(lows, highs))
        else:
            import io
            fo = io.BytesIO()
            coder = ArithmeticCoder(fo)
            for lo, hi in zip(lows, highs):
                coder.push_bounds(int(lo), int(hi))
            coder.flush()
            datas.append(fo.getvalue())

    out = compress_mod._lockstep_decode(datas, lm, K, Ts)  # compile/warm
    got = np.concatenate([out[s, :, :Ts[s]] for s in range(len(Ts))], axis=1)
    assert np.array_equal(got, codes), "LM decode roundtrip mismatch"
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        compress_mod._lockstep_decode(datas, lm, K, Ts)
        best = min(best, time.perf_counter() - t0)
    # the fused device decode blocks the host ~6 times per call (5 output
    # transfers + the verification checksum transfer; the per-chunk scan
    # and verification executables dispatch asynchronously) — subtracting
    # those round-trips gives the tunnel-independent companion
    corrected = max(best - 6 * measure_rtt(), 1e-9)
    return 1e3 * best / T, 1e3 * corrected / T


def bench_ilm_codec():
    """Portable integer-LM (lmv=3) codec rates at the production 24 kHz
    shape: encode via the batched teacher-forced int8-MXU chunk forward,
    decode via the fused integer LM+range-decoder scan on lm_restart
    lockstep blocks. Integer arithmetic needs no checksum verification
    pass, so decode is one scan per chunk with ~3 blocking transfers."""
    import importlib
    import numpy as np
    compress_mod = importlib.import_module("encodec_tpu.stream.compress")
    from encodec_tpu import native
    from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
    from encodec_tpu.models.ilm import IntLMModel
    from encodec_tpu.stream.ac import ArithmeticCoder

    cfg = LMConfig(n_q=8, card=64 if SMOKE else 1024,
                   dim=32 if SMOKE else 200, num_layers=2 if SMOKE else 5,
                   past_context=262)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(0), cfg))
    ilm = IntLMModel.from_lm(lm)
    K, T, R = (8, 64, 32) if SMOKE else (8, 750, 125)
    codes = np.random.RandomState(0).randint(
        0, cfg.card, (K, T)).astype(np.int64)

    ph = _Phases()
    ilm.codec_symbol_bounds(codes)       # compile
    ph.mark("int bounds compile+first call")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ilm.codec_symbol_bounds(codes)
        best = min(best, time.perf_counter() - t0)
    enc_ms = 1e3 * best / T
    ph.mark("encode timing loop")

    blocks = [codes[:, i:i + R] for i in range(0, T, R)]
    Ts = [b.shape[1] for b in blocks]
    datas = []
    for lows, highs in ilm.codec_symbol_bounds_batched(blocks):
        if native.available():
            datas.append(native.encode_bounds(lows, highs))
        else:
            import io
            fo = io.BytesIO()
            coder = ArithmeticCoder(fo)
            for lo, hi in zip(lows, highs):
                coder.push_bounds(int(lo), int(hi))
            coder.flush()
            datas.append(fo.getvalue())

    ph.mark("batched bounds + host coder")
    out = compress_mod._lockstep_decode_int(datas, ilm, K, Ts)
    ph.mark("fused decode compile+first call")
    got = np.concatenate([out[s, :, :Ts[s]] for s in range(len(Ts))], axis=1)
    assert np.array_equal(got, codes), "int LM decode roundtrip mismatch"
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        compress_mod._lockstep_decode_int(datas, ilm, K, Ts)
        best = min(best, time.perf_counter() - t0)
    ph.mark("decode timing loop")
    corrected = max(best - 3 * measure_rtt(), 1e-9)
    return enc_ms, 1e3 * best / T, 1e3 * corrected / T


def bench_stream_latency():
    """Real-time streaming step latency: ONE hop of 24 kHz audio (320
    samples = 13.33 ms) through `StreamingCodec.encode_chunk` +
    `decode_chunk` at 6 kbps, steady state (post-priming). This is the
    per-step latency a live full-duplex deployment pays; the real-time
    budget is the hop itself. Streamed codes/audio are bit-exact with the
    offline model (tests/test_streaming.py), so this measures the SAME
    computation the batch numbers do, in its latency-critical form."""
    import numpy as np
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.streaming import (StreamingCodec,
                                              min_first_chunk,
                                              min_first_latent_chunk)

    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
        causal=True, model_norm="weight_norm", name="encodec_24khz",
        ratios=[8, 5, 4, 2], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 128,
        n_filters=8 if SMOKE else 32)
    model.set_target_bandwidth(6.0)
    sc = StreamingCodec(model)
    hop = sc.hop
    rng = np.random.RandomState(0)

    def prime():
        sc.reset()
        first = max(min_first_chunk(model.cfg.seanet), hop)
        first = ((first + hop - 1) // hop) * hop
        c = sc.encode_chunk(jnp.asarray(
            rng.randn(1, 1, first), jnp.float32))
        need = min_first_latent_chunk(model.cfg.seanet)
        while c.shape[2] < need:  # decoder priming bound
            c = jnp.concatenate(
                [c, sc.encode_chunk(jnp.asarray(
                    rng.randn(1, 1, hop), jnp.float32))], axis=2)
        np.asarray(sc.decode_chunk(c))

    prime()
    chunk = jnp.asarray(rng.randn(1, 1, hop), jnp.float32)

    def step():
        return np.asarray(sc.decode_chunk(sc.encode_chunk(chunk)))

    step()  # compile the steady-state (non-first) executables
    best = float("inf")
    for _ in range(2 if SMOKE else 30):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    # both dispatches are async (encode's output feeds decode without
    # leaving the device); the only blocking point is the final ~1.3 kB
    # audio fetch — exactly ONE round-trip of tunnel time per step.
    # (Subtracting 2 RTTs over-corrects: measured step time on chip is
    # LESS than 2 RTTs because the sends pipeline.)
    corrected = max(best - measure_rtt(), 1e-9)
    return 1e3 * best, 1e3 * corrected, 1e3 * hop / 24_000


def bench_stream_capacity():
    """Concurrent-stream serving capacity: B=2048 full-duplex 6 kbps
    streaming sessions batched into ONE steady-state step (the streaming
    state is batched natively), timed with the pipelined-dispatch
    methodology. Real-time feasible when the sustained step fits the
    13.33 ms hop budget — measured 12.7 ms on chip (B=4096 breaks the
    budget at 26.4 ms), i.e. 2,048 concurrent real-time streams per
    chip. Full sweep: probes/stream_capacity.py."""
    import numpy as np
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.streaming import (StreamingCodec,
                                              min_first_chunk,
                                              min_first_latent_chunk)

    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000, channels=1,
        causal=True, model_norm="weight_norm", name="encodec_24khz",
        ratios=[8, 5, 4, 2], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 128,
        n_filters=8 if SMOKE else 32)
    model.set_target_bandwidth(6.0)
    B = 8 if SMOKE else 2048
    sc = StreamingCodec(model)
    hop = sc.hop
    rng = np.random.RandomState(0)

    ph = _Phases()
    first = max(min_first_chunk(model.cfg.seanet), hop)
    first = ((first + hop - 1) // hop) * hop
    c = sc.encode_chunk(jnp.asarray(rng.randn(B, 1, first), jnp.float32))
    need = min_first_latent_chunk(model.cfg.seanet)
    while c.shape[2] < need:
        c = jnp.concatenate(
            [c, sc.encode_chunk(jnp.asarray(rng.randn(B, 1, hop),
                                            jnp.float32))], axis=2)
    np.asarray(sc.decode_chunk(c))
    ph.mark("priming (first-chunk executables)")

    chunk = jnp.asarray(rng.randn(B, 1, hop), jnp.float32)
    t_step = _timed_pipelined(
        lambda: sc.decode_chunk(sc.encode_chunk(chunk)),
        n=3 if SMOKE else 30)
    ph.mark("steady-state pipelined loop")
    return 1e3 * t_step, 1e3 * hop / 24_000, B


def bench_preemption_save():
    """Graceful-preemption checkpoint latency: full TrainState (params +
    optimizer + EMA codebooks + PRNG) of the production breathing model,
    device->host + atomic versioned write (train/checkpoint.py). Also
    measures what the TRAIN LOOP actually blocks on with the async
    checkpointer: the donation-safe on-device snapshot (the device->host
    copy and disk write overlap the next steps)."""
    import tempfile
    from encodec_tpu.models.model import build_model
    from encodec_tpu.train import create_train_state
    from encodec_tpu.train.checkpoint import AsyncCheckpointer, save_checkpoint

    model = build_model(
        [0.08], sample_rate=10, channels=1, causal=True,
        model_norm="layer_norm", name="breathing_model",
        ratios=[6, 5, 5, 2, 1], bins=64 if SMOKE else 1024,
        dimension=32 if SMOKE else 256, n_filters=8 if SMOKE else 32,
        decoder_final_norm="none", shared_codebook=True)
    ph = _Phases()
    state, _, _ = create_train_state(model, None, seed=0)
    ph.mark("create_train_state")
    best = float("inf")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.ckpt")
        for _ in range(3):
            t0 = time.perf_counter()
            save_checkpoint(state, 1, path)
            best = min(best, time.perf_counter() - t0)
        ph.mark("3x sync save")
        ac = AsyncCheckpointer()
        best_async = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ac.save(state, 1, path)            # returns after the snapshot
            best_async = min(best_async, time.perf_counter() - t0)
            ac.wait()
    return 1e3 * best, 1e3 * best_async


# ---------------------------------------------------------------------------
# Hang-proof orchestration: every metric runs in its OWN subprocess with a
# timeout. A dead/stalled device tunnel blocks inside a C RPC that no
# signal can interrupt (observed: a trivial jitted op hanging >2 min while
# the backend was down) — in-process, one wedged metric would destroy the
# whole panel. Subprocesses also give each metric a fresh PJRT plugin
# registration, replacing the old whole-script re-exec retry.
# ---------------------------------------------------------------------------

_METRIC_FNS = {
    "codec24": lambda: bench_24k_codec() + (measure_rtt(),),
    "codec24_high": lambda: bench_24k_encode_high() + (measure_rtt(),),
    "rt48": lambda: (bench_48k_roundtrip(), measure_rtt()),
    "lm_enc": lambda: bench_lm_encode(),
    "lm_dec": lambda: bench_lm_decode(),
    "ilm": lambda: bench_ilm_codec(),
    "train": lambda: bench_train_step(),
    "save": lambda: bench_preemption_save(),
    "stream": lambda: bench_stream_latency(),
    "stream_cap": lambda: bench_stream_capacity(),
    # tunnel-health probe: the worker's warm_tunnel IS the test; the
    # metric body is a no-op (see _tunnel_alive)
    "tunnelprobe": lambda: True,
}


def _start_stall_watchdog(name: str) -> None:
    """Exit the metric subprocess if no measurement progress happens for
    BENCH_STALL_S seconds (default 360). A stalled tunnel blocks inside a
    C RPC that no signal can interrupt, so an in-process stalled attempt
    would otherwise burn its whole per-metric cap (observed live: one
    800 s train cap swallowed by a stall, starving the rest of the
    panel). Every phase boundary and every per-iteration sync beats the
    heartbeat; the longest legitimate gaps observed on a healthy-or-slow
    tunnel are cold device init (~120 s) and the train-step compile
    (~50 s), both well under the limit. os._exit is deliberate: the main
    thread may be unkillably blocked in the RPC, and the parent treats
    the exit as a failed attempt for the end-of-panel retry pass."""
    limit = float(os.environ.get("BENCH_STALL_S", 360))
    if limit <= 0:
        return
    import threading

    def watch():
        while True:
            time.sleep(10)
            last = _BEAT["t"]
            if last is not None and time.monotonic() - last > limit:
                print(f"[bench]   {name}: no measurement progress for "
                      f"{limit:.0f}s - stall watchdog exiting worker",
                      file=sys.stderr, flush=True)
                os._exit(9)

    threading.Thread(target=watch, daemon=True).start()


def _metric_worker(name: str, q) -> None:
    try:
        print(f"[bench]   jax import -> worker entry: "
              f"{time.perf_counter() - _IMPORT_T0:.1f}s",
              file=sys.stderr, flush=True)
        _beat()
        _start_stall_watchdog(name)
        if name in os.environ.get("BENCH_TEST_STALL_METRICS",
                                  "").split(","):
            time.sleep(100_000)  # contract-test stall injection
        ph = _Phases()
        if not SMOKE:
            _warm_tunnel()
        ph.mark("warm_tunnel")
        q.put(("ok", _METRIC_FNS[name]()))
    except BaseException as exc:  # noqa: BLE001 — report to the parent
        try:
            q.put(("err", repr(exc)[:300]))
        except Exception:
            pass


def _run_metric(name: str, deadline: float, cap: float, attempts: int = 2):
    """Run one metric in a subprocess; kill on timeout. The per-attempt
    timeout is recomputed against the PANEL deadline so a retry never
    pushes the whole panel past the driver's wall budget (VERDICT r4 #1b).
    Returns (value, None) or (None, error_string)."""
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    err = "unknown"
    for attempt in range(attempts):
        timeout_s = min(cap, deadline - time.monotonic())
        if timeout_s < min(60.0, cap):
            return None, err if attempt else "skipped: budget exhausted"
        q = ctx.Queue()
        p = ctx.Process(target=_metric_worker, args=(name, q), daemon=True)
        t0 = time.perf_counter()
        p.start()
        p.join(timeout_s)
        if p.is_alive():
            p.kill()
            p.join()
            err = (f"timed out after {timeout_s:.0f}s (device tunnel "
                   f"stalled?)")
            print(f"[bench] {name}: attempt {attempt + 1} {err}",
                  file=sys.stderr)
            continue
        try:
            status, payload = q.get(timeout=10)
        except Exception:
            err = f"worker died without result (exitcode {p.exitcode})"
            print(f"[bench] {name}: attempt {attempt + 1} {err}",
                  file=sys.stderr)
            continue
        if status == "ok":
            print(f"[bench] {name}: ok in "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
            return payload, None
        err = payload
        print(f"[bench] {name}: attempt {attempt + 1} failed: {err}",
              file=sys.stderr)
    return None, err


def main():
    """Incremental panel: metrics run in VALUE order (primary codec24
    first, then the tunnel-independent train step), and the full compact
    JSON record accumulated so far is RE-PRINTED to stdout after every
    metric — the driver's tail parse therefore captures whatever completed
    no matter when the process is killed (VERDICT r4 #1a). The panel
    deadline defaults to 1500 s and metrics are hard-SKIPPED (not floored)
    once it passes (#1b)."""
    extra = {}
    primary = {"value": None}
    rtt_holder = {"rtt": None}
    n_ok = 0
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_BUDGET_S", 1500))

    def _rtf(value, t_per_iter_audio_s):
        """RTT-corrected companion for a per-step-synced RTF: the same
        measurement with ONE dispatch round-trip subtracted (conservative —
        multi-dispatch iterations pay more than one, so the corrected
        value still understates on-chip throughput)."""
        rtt = rtt_holder["rtt"] or 0.0
        t = t_per_iter_audio_s / value
        return round(t_per_iter_audio_s / max(t - rtt, 1e-9), 1)

    def emit():
        """One compact stdout line with everything accumulated so far.
        Re-emitted after every metric; the LAST line is the contract."""
        compact_extra = {}
        for name, m in extra.items():
            if m.get("unit") == "error":
                compact_extra[name] = {"err": str(m.get("baseline"))[:80]}
                continue
            c = {"v": m.get("value"), "vs": m.get("vs_baseline")}
            if "rtt_corrected_value" in m:
                c["rc"] = m["rtt_corrected_value"]
            compact_extra[name] = c
        print(json.dumps({
            "metric": "encode_rtf_24khz",
            "value": primary["value"],
            "unit": "x_realtime",
            "vs_baseline": (round(primary["value"] / 200.0, 2)
                            if primary["value"] is not None else None),
            "extra_metrics": compact_extra,
            "keys": "v=value vs=vs_baseline rc=rtt_corrected_value; "
                    "full record on stderr + BENCH.md",
        }, separators=(",", ":")), flush=True)

    failed = []
    stalled = {"flag": False}

    def _tunnel_alive():
        """After a stall failure, gate further sections on a cheap
        tunnel-health probe: a worker whose only job is warm_tunnel,
        capped at BENCH_PROBE_CAP_S (default 150 s — startup ~45-70 s +
        a healthy warmup). During a dead-tunnel window this costs ~150 s
        per probe instead of ~430 s per burned section (observed live:
        four consecutive sections each lost ~430 s to one window), and
        sections are only spent once the tunnel answers."""
        cap = float(os.environ.get("BENCH_PROBE_CAP_S", 150))
        while deadline - time.monotonic() >= cap + 60.0:
            print("[bench] probing tunnel health", file=sys.stderr)
            _, err = _run_metric("tunnelprobe", deadline, cap, attempts=1)
            if err is None:
                return True
        return False

    def run(json_name, metric, cap, fold, attempts=1):
        """One pass over a metric: a SINGLE subprocess attempt by default.
        Failures go on the `failed` list for the end-of-panel retry pass —
        tunnel stalls come in multi-minute windows (observed live: two
        consecutive metrics each losing both their back-to-back attempts
        to one window), so retrying immediately doubles the loss while
        retrying after the rest of the panel lets a recovered tunnel
        rescue the metric."""
        nonlocal n_ok
        if stalled["flag"]:
            if _tunnel_alive():
                stalled["flag"] = False
            else:
                if json_name + "_error" not in extra:
                    extra[json_name + "_skipped"] = {
                        "value": None, "unit": "error",
                        "vs_baseline": None,
                        "baseline": "skipped: device tunnel unresponsive "
                                    "and panel budget exhausted"}
                print(f"[bench] {metric}: skipped (tunnel down / budget)",
                      file=sys.stderr)
                # still retry-eligible: a recovery during the retry pass
                # (whose run() re-probes) can rescue skipped sections
                failed.append((json_name, metric, cap, fold))
                emit()
                return
        if deadline - time.monotonic() < 60.0:
            if json_name + "_error" not in extra:
                extra[json_name + "_skipped"] = {
                    "value": None, "unit": "error", "vs_baseline": None,
                    "baseline": "skipped: panel budget exhausted"}
            print(f"[bench] {metric}: skipped (budget exhausted)",
                  file=sys.stderr)
        else:
            value, err = _run_metric(metric, deadline, cap,
                                     attempts=attempts)
            if err is not None:
                extra[json_name + "_error"] = {
                    "value": None, "unit": "error", "vs_baseline": None,
                    "baseline": err[:200]}
                failed.append((json_name, metric, cap, fold))
                if "exitcode 9" in err or "timed out" in err:
                    stalled["flag"] = True
            else:
                n_ok += 1
                extra.pop(json_name + "_error", None)
                extra.pop(json_name + "_skipped", None)
                fold(value)
        emit()

    def fold_codec24(v):
        enc_rtf, dec_rtf, roofline, thr_rtf, dec_thr_rtf, rtt_s = v
        rtt_holder["rtt"] = rtt_s
        primary["value"] = round(enc_rtf, 1)
        extra["encode_rtf_24khz_pipelined"] = {
            "value": round(thr_rtf, 1), "unit": "x_realtime",
            "vs_baseline": round(thr_rtf / 200.0, 2),
            "baseline": "200x realtime (BASELINE.md); sustained "
                        "throughput: 20 back-to-back dispatches, ONE "
                        "final single-element sync — a direct "
                        "measurement of on-chip encode throughput with "
                        "the tunnel RTT amortized (device executes in "
                        "dispatch order, so the last scalar being ready "
                        "implies all prior iterations finished)",
            "tunnel_bound": False}
        extra["decode_rtf_24khz"] = {
            "value": round(dec_rtf, 1), "unit": "x_realtime",
            "vs_baseline": round(dec_rtf / 200.0, 2),
            "baseline": "200x realtime (BASELINE.md encode target reused)",
            "tunnel_bound": True,
            "rtt_corrected_value": _rtf(dec_rtf, 32.0)}
        extra["decode_rtf_24khz_pipelined"] = {
            "value": round(dec_thr_rtf, 1), "unit": "x_realtime",
            "vs_baseline": round(dec_thr_rtf / 200.0, 2),
            "baseline": "200x realtime; sustained decode throughput, "
                        "same pipelined-dispatch methodology as "
                        "encode_rtf_24khz_pipelined",
            "tunnel_bound": False}
        if roofline is not None:
            extra["encode_fraction_of_memory_roofline"] = {
                "value": round(roofline, 3), "unit": "fraction",
                "vs_baseline": None,
                "baseline": "analytic bytes-accessed / 819 GB/s v5e HBM "
                            "over the measured pipelined device time "
                            "(1.0 = at the "
                            "memory floor). f32 HIGHEST's residual is a "
                            "compute-shape bound (small-channel MXU "
                            "underfill x 6-pass f32 emulation, per-stage "
                            "breakdown in BENCH.md), pinned by bit-parity "
                            "semantics",
                "tunnel_bound": False}
        extra["tunnel_rtt_ms"] = {
            "value": round(1e3 * rtt_s, 2), "unit": "ms",
            "vs_baseline": None,
            "baseline": "per-dispatch host<->device round trip "
                        "(environment, not framework; basis of "
                        "rtt_corrected_value fields)",
            "tunnel_bound": True}

    def fold_train(v):
        train_s, train_s_bf16 = v
        extra["train_step_production"] = {
            "value": round(train_s, 3), "unit": "s_per_step",
            "vs_baseline": round(0.71 / train_s, 2),
            "baseline": "0.71 s/step (round-1 BENCH.md, same shapes)",
            "tunnel_bound": False}
        extra["train_step_production_bf16"] = {
            "value": round(train_s_bf16, 3), "unit": "s_per_step",
            "vs_baseline": round(0.71 / train_s_bf16, 2),
            "baseline": "0.71 s/step f32 (mixed-precision conv trunks, "
                        "f32 masters)",
            "tunnel_bound": False}

    def fold_rt48(v):
        (rtf_48k, rtf_48k_high, rtf_48k_thr), rtt_s = v
        if rtt_holder["rtt"] is None:
            rtt_holder["rtt"] = rtt_s
        extra["roundtrip_rtf_48khz_segmented"] = {
            "value": round(rtf_48k, 1), "unit": "x_realtime",
            "vs_baseline": round(rtf_48k / 200.0, 2),
            "baseline": "200x realtime",
            "tunnel_bound": True,
            # slicing-fused encode + fused decode = 2 pipelined
            # dispatches, one blocking sync per iteration
            "rtt_corrected_value": _rtf(rtf_48k, 10.0)}
        extra["roundtrip_rtf_48khz_segmented_high"] = {
            "value": round(rtf_48k_high, 1), "unit": "x_realtime",
            "vs_baseline": round(rtf_48k_high / 200.0, 2),
            "baseline": "200x realtime",
            "tunnel_bound": True,
            "rtt_corrected_value": _rtf(rtf_48k_high, 10.0),
            "note": "set_precision('high'), audited flip-free at every "
                    "served bandwidth on the full-size models "
                    "(tests/margin_audit.py audit_precision); 'highest' "
                    "is the parity default"}
        extra["roundtrip_rtf_48khz_segmented_pipelined"] = {
            "value": round(rtf_48k_thr, 1), "unit": "x_realtime",
            "vs_baseline": round(rtf_48k_thr / 200.0, 2),
            "baseline": "200x realtime; sustained 48 kHz roundtrip "
                        "throughput ('highest'), pipelined-dispatch "
                        "methodology (one final single-element sync "
                        "over 10 back-to-back roundtrips)",
            "tunnel_bound": False}

    def fold_stream(v):
        lat_ms, lat_corr_ms, hop_ms = v
        extra["stream_step_latency_ms"] = {
            "value": round(lat_ms, 2), "unit": "ms",
            # >1.0 = the steady-state streaming step fits the real-time
            # budget (one 13.33 ms hop) even through the tunnel
            "vs_baseline": round(hop_ms / lat_ms, 2),
            "baseline": f"{hop_ms:.2f} ms (one 24 kHz hop — the "
                        "real-time budget for a live full-duplex stream)",
            "tunnel_bound": True,
            "rtt_corrected_value": round(lat_corr_ms, 2),
            "note": "steady-state encode_chunk+decode_chunk of ONE hop "
                    "at 6 kbps (bit-exact with offline encode/decode); "
                    "the dispatches pipeline and only the final audio "
                    "fetch blocks — one RTT, subtracted in the corrected "
                    "value"}

    def fold_lm_enc(lm_ms):
        extra["lm_encode_ms_per_token"] = {
            "value": round(lm_ms, 3), "unit": "ms_per_token",
            "vs_baseline": round(7.3 / lm_ms, 1),
            "baseline": "7.3 ms/token (reference torch CPU streaming "
                        "step)",
            "tunnel_bound": True}

    def fold_ilm(v):
        ienc, idec, idec_corr = v
        extra["lm_portable_encode_ms_per_token"] = {
            "value": round(ienc, 3), "unit": "ms_per_token",
            "vs_baseline": round(7.3 / ienc, 1),
            "baseline": "7.3 ms/token (reference torch CPU streaming "
                        "step); lmv=3 integer LM, machine-portable",
            "tunnel_bound": True}
        extra["lm_portable_decode_ms_per_token"] = {
            "value": round(idec, 3), "unit": "ms_per_token",
            "vs_baseline": round(7.3 / idec, 1),
            "baseline": "7.3 ms/token (reference torch CPU streaming "
                        "step)",
            "tunnel_bound": True,
            "rtt_corrected_value": round(idec_corr, 3),
            "note": "fused integer LM + range decode, lm_restart "
                    "lockstep; no verification pass (exact by "
                    "construction), ~3 blocking transfers subtracted "
                    "in the corrected value"}

    def fold_lm_dec(v):
        lm_dec, lm_dec_corr = v
        extra["lm_decode_ms_per_token"] = {
            "value": round(lm_dec, 3), "unit": "ms_per_token",
            "vs_baseline": round(7.3 / lm_dec, 1),
            "baseline": "7.3 ms/token (reference torch CPU streaming "
                        "step; decode re-runs the same cell per token)",
            "tunnel_bound": True,
            "rtt_corrected_value": round(lm_dec_corr, 3),
            "note": "fused on-device decode (LM cell + CDF + range "
                    "decoder in one scan per chunk, checksum-verified "
                    "against the encoder's executable) on lm_restart "
                    "lockstep blocks; ~6 blocking host transfers per "
                    "call, subtracted in the corrected value"}

    def fold_stream_cap(v):
        step_ms, hop_ms, nstreams = v
        extra["stream_concurrent_step_ms"] = {
            "value": round(step_ms, 2), "unit": "ms",
            # >1.0 = B concurrent streams are real-time feasible
            "vs_baseline": round(hop_ms / step_ms, 2),
            "baseline": f"{hop_ms:.2f} ms hop budget for {nstreams} "
                        "concurrent full-duplex 6 kbps streams batched "
                        "into one steady-state step (pipelined-dispatch "
                        "measurement; capacity sweep in "
                        "probes/stream_capacity.py and BENCH.md)",
            "tunnel_bound": False}

    def fold_save(v):
        sync_ms, async_ms = v
        extra["preemption_save_ms"] = {
            "value": round(sync_ms, 1), "unit": "ms",
            "vs_baseline": None,
            "baseline": "full TrainState device->host + atomic versioned "
                        "write (no reference equivalent: torch.save "
                        "only)",
            "tunnel_bound": True}
        extra["checkpoint_blocking_ms_async"] = {
            "value": round(async_ms, 1), "unit": "ms",
            "vs_baseline": None,
            "baseline": "what the train loop blocks on with "
                        "checkpoint.async_save: the donation-safe "
                        "on-device snapshot; the device->host copy and "
                        "disk write overlap the following steps",
            "tunnel_bound": True}

    def fold_codec24_high(v):
        enc_high_rtf, roofline_high, thr_high_rtf, rtt_s = v
        if rtt_holder["rtt"] is None:
            rtt_holder["rtt"] = rtt_s
        extra["encode_rtf_24khz_high_pipelined"] = {
            "value": round(thr_high_rtf, 1), "unit": "x_realtime",
            "vs_baseline": round(thr_high_rtf / 200.0, 2),
            "baseline": "200x realtime; sustained set_precision('high') "
                        "encode throughput, pipelined-dispatch "
                        "methodology",
            "tunnel_bound": False}
        extra["encode_rtf_24khz_high"] = {
            "value": round(enc_high_rtf, 1), "unit": "x_realtime",
            "vs_baseline": round(enc_high_rtf / 200.0, 2),
            "baseline": "200x realtime",
            "tunnel_bound": True,
            "rtt_corrected_value": _rtf(enc_high_rtf, 32.0),
            "note": "set_precision('high') encode (3-pass bf16 + VPU "
                    "shift lowering), audited flip-free at every served "
                    "bandwidth on the full-size models "
                    "(tests/margin_audit.py audit_precision); 'highest' "
                    "is the bit-exact parity default and the primary "
                    "metric"}
        if roofline_high is not None:
            extra["encode_high_fraction_of_memory_roofline"] = {
                "value": round(roofline_high, 3), "unit": "fraction",
                "vs_baseline": None,
                "baseline": "same floor for the set_precision('high') "
                            "serving mode (tie-guard-certified as a "
                            "byte-safe container writer)",
                "tunnel_bound": False}

    # Value order: the primary metric and the tunnel-independent train
    # step land first (VERDICT r4 #1c/weak-2); extras follow; the third
    # remote AOT compile (the 'high' encode variant) goes last.
    emit()  # a parseable line exists from second zero
    run("encode_rtf_24khz", "codec24", 900.0, fold_codec24)
    run("train_step_production", "train", 800.0, fold_train)
    run("roundtrip_rtf_48khz_segmented", "rt48", 600.0, fold_rt48)
    run("stream_step_latency_ms", "stream", 500.0, fold_stream)
    run("lm_encode_ms_per_token", "lm_enc", 500.0, fold_lm_enc)
    run("lm_portable_ms_per_token", "ilm", 500.0, fold_ilm)
    run("lm_decode_ms_per_token", "lm_dec", 500.0, fold_lm_dec)
    run("preemption_save_ms", "save", 400.0, fold_save)
    run("encode_rtf_24khz_high", "codec24_high", 400.0, fold_codec24_high)
    run("stream_concurrent_step_ms", "stream_cap", 400.0, fold_stream_cap)

    # Retry pass: the tunnel can stall for minutes and then recover
    # (observed live: device init hangs, later metrics succeed). Spend
    # whatever budget remains re-running pass-1 failures — primary first
    # (a late primary beats a null record), then the rest in panel order.
    retries = list(failed)
    failed.clear()
    retries.sort(key=lambda it: it[1] != "codec24")
    for json_name, metric, cap, fold in retries:
        if deadline - time.monotonic() < 60.0:
            break
        print(f"[bench] retry pass: {metric}", file=sys.stderr)
        run(json_name, metric, cap, fold)

    # Full record (baselines, notes, methodology) goes to STDERR and
    # BENCH.md; stdout carries only the compact lines emitted above (the
    # r03 failure was an oversize stdout line, the r04 failure was a
    # kill before the single end-of-run print — both modes are covered
    # by the incremental compact emission).
    record = {
        "metric": "encode_rtf_24khz",
        "value": primary["value"],
        "unit": "x_realtime",
        "vs_baseline": (round(primary["value"] / 200.0, 2)
                        if primary["value"] is not None else None),
        "extra_metrics": extra,
        "methodology": (
            "Serialized timing: every iteration ends with a jitted "
            "single-element fetch (4 bytes), best-of-N. On this backend "
            "block_until_ready can return early and materializing outputs "
            "pays the tunnel's ~30 MB/s copy bandwidth, so the scalar "
            "fetch is the only probe that waits correctly; it costs one "
            "~30-50 ms tunnel RTT per iteration, which the "
            "rtt_corrected_value companions subtract (the 24 kHz encode "
            "itself runs in ~11 ms on chip — ~2,900x realtime "
            "device-resident). tunnel_bound=false metrics (the 4 h train "
            "step, ~0.7 s of on-chip compute per step) amortize the RTT "
            "and are environment-independent."),
    }
    print(json.dumps(record), file=sys.stderr)
    return 0 if n_ok else 1


if __name__ == "__main__":
    # The parent never touches devices: plugin registration (which
    # transiently fails on this container) and any tunnel stall happen
    # inside per-metric subprocesses, which _run_metric retries or times
    # out. No re-exec needed.
    sys.exit(main())
