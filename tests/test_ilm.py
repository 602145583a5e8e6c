"""Integer (portable) LM tests — the lmv=3 bitstream contract.

The load-bearing property is EXACTNESS-BY-CONSTRUCTION: every op in
`models.ilm` is an exactly-defined integer op, so any executable on any
platform reproduces the encoder's CDF rows bit-for-bit. Witnesses here:

* a pure-NUMPY golden reimplementation of the streaming cell matches the
  XLA version bit-exactly (two fully independent arithmetic stacks — a
  platform that disagreed with either would have to mis-implement exact
  integer semantics);
* batched teacher-forced vs streaming-scan vs different chunk sizes are
  all bit-identical (the float LM measurably is NOT — models/lm.py);
* `.ecdc` lmv=3 roundtrips through every container layout, with the CRC
  gate catching corruption;
* the rate cost vs the float prior stays under 1% on a trained LM.
"""

import io
import importlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from encodec_tpu.models.lm import LMConfig, init_lm, LMModel
from encodec_tpu.models import ilm

cmod = importlib.import_module("encodec_tpu.stream.compress")


def _small_lm(n_q=4, card=64, dim=16, heads=2, layers=2, W=20, seed=0):
    cfg = LMConfig(n_q=n_q, card=card, dim=dim, num_heads=heads,
                   num_layers=layers, past_context=W)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(seed), cfg))
    return lm, ilm.IntLMModel.from_lm(lm)


def _codec(bins=64, n_filters=4, name="encodec_24khz"):
    from encodec_tpu.models.model import build_model
    m = build_model([1.5, 3.0], sample_rate=24000, channels=1, causal=True,
                    model_norm="weight_norm", name=name,
                    ratios=[8, 5, 4, 2], bins=bins, dimension=16,
                    n_filters=n_filters)
    m.set_target_bandwidth(1.5)
    return m, {m.name: (lambda pretrained=True: m)}


# ---------------------------------------------------------------------------
# numpy golden reimplementation (int64 — independent of the 32-bit limb
# arithmetic in models.ilm; every floor/shift/mask point mirrored exactly)
# ---------------------------------------------------------------------------

def _np_rshift_round(x, s):
    if s <= 0:
        return x << (-s)
    return (x + (1 << (s - 1))) >> s


def _np_linear(x, layer, e):
    x = np.clip(x, -ilm.MM_CLIP, ilm.MM_CLIP)
    acc = x @ layer["w"].astype(np.int64)
    return _np_rshift_round(acc, e) + layer["b"].astype(np.int64)


def _np_layernorm(x, scale_q, bias_q, d, lut_inv, eps_units, kd):
    x = np.clip(x, -ilm.ACT_MAX, ilm.ACT_MAX)
    s = x.sum(-1, keepdims=True)
    half = d // 2
    mu = (s + np.where(s >= 0, half, -half)) // d
    c = np.clip(x - mu, -32768, 32767)
    v = (c * c).sum(-1, keepdims=True) + eps_units
    eb = np.vectorize(lambda z: int(z).bit_length())(v) - 1
    h = (eb - 15) >> 1
    m = np.where(h >= 0, v >> np.maximum(2 * h, 0),
                 v << np.maximum(-2 * h, 0))
    y0 = lut_inv[np.clip((m >> 7) - 256, 0, 767)].astype(np.int64)
    qq = (m * y0 * y0) >> 30
    y1 = (y0 * ((3 << 14) - qq)) >> 15
    cy = c * y1
    n = np.sign(cy) * ((np.abs(cy) * kd) >> np.clip(22 + h, 0, 63))
    n = np.clip(n, -ilm.ACT_MAX, ilm.ACT_MAX)
    out = _np_rshift_round(n * scale_q.astype(np.int64), ilm.ABITS) \
        + bias_q.astype(np.int64)
    return np.clip(out, -ilm.ACT_MAX, ilm.ACT_MAX)


def _np_exp2(t, lut):
    u = np.minimum(-t, 31 << ilm.ABITS)
    q = u >> ilm.ABITS
    r = u & 1023
    f = (1024 - r) & 1023
    shift = q + (r != 0)
    return lut[f].astype(np.int64) >> np.minimum(shift, 31)


def _np_to_base2(t):
    return _np_rshift_round((t * ilm.LOG2E_Q14) >> 7, 7)


def _np_softmax_weights(logits, mask, lut):
    lm_ = np.where(mask, logits, -(1 << 30))
    mx = lm_.max(-1, keepdims=True)
    t = np.clip(lm_ - mx, -(63 << ilm.ABITS), 0)
    e = np.where(mask, _np_exp2(_np_to_base2(t), lut), 0)
    tot = np.maximum(e.sum(-1, keepdims=True), 1)
    return (e << 12) // tot


def _np_gelu(x, lut):
    xc = np.clip(x, -(16 << ilm.ABITS), (16 << ilm.ABITS) - 1)
    u = xc + (16 << ilm.ABITS)
    idx = u >> 6
    frac = u & 63
    t0 = lut[idx].astype(np.int64)
    t1 = lut[idx + 1].astype(np.int64)
    return t0 + (((t1 - t0) * frac) >> 6)


def _np_sin_phase(phase, lut):
    quad = phase >> 30
    p20 = (phase >> 10) & 0xFFFFF
    mirrored = np.where((quad & 1) == 1, (1 << 20) - p20, p20)
    idx = mirrored >> 10
    frac = mirrored & 1023
    s0 = lut[idx].astype(np.int64)
    s1 = lut[idx + 1].astype(np.int64)
    v = s0 + (((s1 - s0) * frac) >> 10)
    return _np_rshift_round(np.where(quad >= 2, -v, v), 4)


def _np_ilm_step(iparams, exps, indices, kc, vc, length, phase, cfg):
    """Golden streaming cell: indices [B, K] int, caches int64 [L,B,W,d].
    Returns (cdf [B,K,card], kc, vc, length, phase)."""
    B, K = indices.shape
    W, H, d = cfg.past_context, cfg.num_heads, cfg.dim
    hd = d // H
    eps_units, kd = ilm.layernorm_consts(d)
    ks = ilm.qk_scale_const(hd)
    lut = {k: np.asarray(v) for k, v in iparams["lut"].items()}

    emb = np.asarray(iparams["emb"]).astype(np.int64)
    x = np.zeros((B, d), np.int64)
    for k in range(K):
        x += emb[k][indices[:, k]]
    x = _np_layernorm(x, np.asarray(iparams["norm_in"]["scale"]),
                      np.asarray(iparams["norm_in"]["bias"]), d,
                      lut["invsqrt"], eps_units, kd)
    pe = np.concatenate([
        _np_sin_phase((phase + (1 << 30)) % (1 << 32), lut["sin"]),
        _np_sin_phase(phase, lut["sin"])])
    x = np.clip(x + pe, -ilm.ACT_MAX, ilm.ACT_MAX)[:, None]   # [B,1,d]

    n_valid = min(int(length), W)
    slot_valid = np.arange(W) >= (W - n_valid)
    mask = np.concatenate([slot_valid, [True]])

    names = ("q", "k", "v", "out", "ff1", "ff2")
    for li, layer in enumerate(iparams["layers"]):
        ly = {n: {"w": np.asarray(layer[n]["w"]),
                  "b": np.asarray(layer[n]["b"])} for n in names}
        e = {n: exps[1 + 6 * li + i] for i, n in enumerate(names)}
        q = _np_linear(x, ly["q"], e["q"])
        k_new = np.clip(_np_linear(x, ly["k"], e["k"]),
                        -ilm.MM_CLIP, ilm.MM_CLIP)
        v_new = np.clip(_np_linear(x, ly["v"], e["v"]),
                        -ilm.MM_CLIP, ilm.MM_CLIP)
        keys = np.concatenate([kc[li], k_new], axis=1)        # [B,W+1,d]
        vals = np.concatenate([vc[li], v_new], axis=1)
        q7 = np.clip(_np_rshift_round(q, ilm.ABITS - ilm.QBITS),
                     -2047, 2047)
        qh = q7.reshape(B, 1, H, hd)
        kh = keys.reshape(B, W + 1, H, hd)
        logits = np.einsum("bthd,bshd->bhts", qh, kh)
        l10 = np.clip(_np_rshift_round(logits, 7), -65535, 65535)
        l10 = np.clip((l10 * ks) >> 12, -(63 << ilm.ABITS),
                      63 << ilm.ABITS)
        a = _np_softmax_weights(l10, mask[None, None, None, :], lut["exp2"])
        out = np.einsum("bhts,bshd->bthd", a,
                        vals.reshape(B, W + 1, H, hd))
        attn = _np_rshift_round(out.reshape(B, 1, -1), 12)
        o = _np_linear(attn, ly["out"], e["out"])
        x1 = _np_layernorm(x + o, np.asarray(layer["norm1"]["scale"]),
                           np.asarray(layer["norm1"]["bias"]), d,
                           lut["invsqrt"], eps_units, kd)
        ff = _np_linear(_np_gelu(_np_linear(x1, ly["ff1"], e["ff1"]),
                                 lut["gelu"]), ly["ff2"], e["ff2"])
        x = _np_layernorm(x1 + ff, np.asarray(layer["norm2"]["scale"]),
                          np.asarray(layer["norm2"]["bias"]), d,
                          lut["invsqrt"], eps_units, kd)
        kc[li] = np.concatenate([kc[li][:, 1:], k_new], axis=1)
        vc[li] = np.concatenate([vc[li][:, 1:], v_new], axis=1)

    # head
    xh = np.clip(x[:, 0], -ilm.MM_CLIP, ilm.MM_CLIP)
    w = np.asarray(iparams["head_w"]).astype(np.int64)[:K]
    acc = np.einsum("bd,kdn->bkn", xh, w)
    logits = _np_rshift_round(acc, exps[0]) \
        + np.asarray(iparams["head_b"]).astype(np.int64)[:K]
    mx = logits.max(-1, keepdims=True)
    t = np.clip(logits - mx, -(63 << ilm.ABITS), 0)
    scores = _np_exp2(_np_to_base2(t), lut["exp2"])
    card = scores.shape[-1]
    m = (1 << ilm.TOTAL_RANGE_BITS) - 2 * card
    tot = np.maximum(scores.sum(-1, keepdims=True), 1)
    p16 = (scores << 16) // tot
    cdf = np.cumsum(2 + ((p16 * (m >> 10)) >> 6), axis=-1)
    length = min(length + 1, W + 1)
    phase = (phase + lut["pos_step"].astype(np.int64)) % (1 << 32)
    return cdf, kc, vc, length, phase


def test_numpy_golden_bit_exact():
    """XLA integer cell == independent numpy int64 golden, bit for bit,
    over a multi-chunk teacher-forced sequence (the cross-platform
    witness: both stacks implement exact integer semantics)."""
    lm, m = _small_lm()
    cfg = m.cfg
    W, d, L = cfg.past_context, cfg.dim, cfg.num_layers
    rng = np.random.RandomState(1)
    T, K, B = 2 * W + 5, cfg.n_q, 1
    shifted = rng.randint(0, cfg.card + 1, (B, K, T)).astype(np.int32)

    # XLA streaming scan
    state = m.init_stream(batch=B)
    step = jax.jit(lambda p, i, s: ilm.ilm_step(p, m.exps, i, s, cfg))
    xla_rows = []
    for t in range(T):
        r, state = step(m.iparams, jnp.asarray(shifted[:, :, t]), state)
        xla_rows.append(np.asarray(r))
    xla_rows = np.stack(xla_rows)

    # numpy golden
    ip = jax.tree.map(np.asarray, m.iparams)
    kc = np.zeros((L, B, W, d), np.int64)
    vc = np.zeros((L, B, W, d), np.int64)
    names = ("q", "k", "v", "out", "ff1", "ff2")
    del names
    for li, layer in enumerate(ip["layers"]):
        kc[li, :, W - 1] = np.clip(np.asarray(layer["k"]["b"]),
                                   -ilm.MM_CLIP, ilm.MM_CLIP)
        vc[li, :, W - 1] = np.clip(np.asarray(layer["v"]["b"]),
                                   -ilm.MM_CLIP, ilm.MM_CLIP)
    length, phase = 1, np.zeros(d // 2, np.int64)
    for t in range(T):
        cdf, kc, vc, length, phase = _np_ilm_step(
            ip, m.exps, shifted[:, :, t], kc, vc, length, phase, cfg)
        assert np.array_equal(cdf, xla_rows[t]), f"golden mismatch at t={t}"


def test_batch_stream_chunk_bit_identity():
    """Batched teacher-forced == streaming scan == any chunk split —
    the invariance the float LM lacks (its docstring documents ~1e-7
    cross-executable drift; integers have none)."""
    lm, m = _small_lm(seed=3)
    cfg = m.cfg
    rng = np.random.RandomState(2)
    B, K, T = 2, cfg.n_q, 47
    shifted = rng.randint(0, cfg.card + 1, (B, K, T)).astype(np.int32)

    full, _ = m.chunk_exec(B, K, T)(
        m.iparams, jnp.asarray(shifted),
        ilm.carry_from_state(m.init_stream(batch=B)))
    full = np.asarray(full)

    state = m.init_stream(batch=B)
    step = jax.jit(lambda p, i, s: ilm.ilm_step(p, m.exps, i, s, cfg))
    for t in range(T):
        r, state = step(m.iparams, jnp.asarray(shifted[:, :, t]), state)
        assert np.array_equal(np.asarray(r), full[:, t]), t

    carry = ilm.carry_from_state(m.init_stream(batch=B))
    outs = []
    pad = np.zeros((B, K, 60), np.int32)
    pad[:, :, :T] = shifted
    fn = m.chunk_exec(B, K, 12)
    for c in range(5):
        cdf, carry = fn(m.iparams, jnp.asarray(pad[:, :, 12 * c:12 * (c + 1)]),
                        carry)
        outs.append(np.asarray(cdf))
    chunked = np.concatenate(outs, axis=1)[:, :T]
    assert np.array_equal(chunked, full)


def test_cdf_rows_always_valid():
    """By construction: every range >= 2 and cdf[-1] <= 2^24, even on
    adversarial peaked scores."""
    lm, m = _small_lm(seed=5)
    rng = np.random.RandomState(4)
    B, K, T = 1, m.cfg.n_q, 33
    shifted = rng.randint(0, m.cfg.card + 1, (B, K, T)).astype(np.int32)
    cdf, _ = m.chunk_exec(B, K, T)(
        m.iparams, jnp.asarray(shifted),
        ilm.carry_from_state(m.init_stream(batch=B)))
    cdf = np.asarray(cdf)
    assert cdf[..., -1].max() <= 2 ** 24
    ranges = np.diff(cdf, axis=-1)
    assert ranges.min() >= 2 and cdf[..., 0].min() >= 2
    # extreme synthetic scores
    s = jnp.zeros((1, m.cfg.card), jnp.int32).at[0, 3].set(16383)
    c = np.asarray(ilm.scores_to_cdf(s))
    assert c[0, -1] <= 2 ** 24 and np.diff(c).min() >= 2 and c[0, 0] >= 2


def test_phase_offset_matches_accumulation():
    """init_stream(offset=n) == n wraparound additions from offset 0."""
    lm, m = _small_lm()
    steps = np.asarray(m.iparams["lut"]["pos_step"]).astype(np.uint64)
    n = 12345
    direct = np.asarray(m.init_stream(offset=n).phase)
    acc = np.zeros_like(steps)
    expected = ((n * steps) % (1 << 32)).astype(np.uint32)
    del acc
    assert np.array_equal(direct, expected)


def test_ecdc_lmv3_roundtrip_single_frame():
    model, reg = _codec()
    lm, _ = _small_lm(n_q=model.cfg.rvq.n_q, W=20)
    wav = np.random.RandomState(5).randn(1, 6000).astype(np.float32) * 0.3
    data = cmod.compress(model, wav, use_lm=True, lm=lm, models=reg)
    meta = cmod.binary.read_ecdc_header(io.BytesIO(data))
    assert meta["lmv"] == 3 and "cc" in meta
    out, sr = cmod.decompress(data, models=reg, lm=lm)
    raw, _ = cmod.decompress(
        cmod.compress(model, wav, models=reg), models=reg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(raw))


def test_ecdc_lmv3_roundtrip_lm_restart():
    model, reg = _codec()
    lm, _ = _small_lm(n_q=model.cfg.rvq.n_q, W=20)
    wav = np.random.RandomState(6).randn(1, 8000).astype(np.float32) * 0.3
    data = cmod.compress(model, wav, use_lm=True, lm=lm, models=reg,
                         lm_restart=7)
    meta = cmod.binary.read_ecdc_header(io.BytesIO(data))
    assert meta["lmv"] == 3 and meta["lmb"] == 7
    out, _ = cmod.decompress(data, models=reg, lm=lm)
    ref, _ = cmod.decompress(
        cmod.compress(model, wav, models=reg), models=reg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ecdc_lmv3_roundtrip_multisegment():
    """Segmented + normalized (48 kHz-style) model: 'fl'-indexed lockstep
    layout through the integer decoder."""
    from encodec_tpu.models.model import build_model
    m48 = build_model([3.0, 6.0], sample_rate=48000, channels=1,
                      causal=False, model_norm="time_group_norm",
                      name="encodec_48khz", ratios=[8, 5, 4, 2], bins=64,
                      dimension=16, n_filters=4, audio_normalize=True,
                      segment=1.0)
    m48.set_target_bandwidth(3.0)
    reg = {m48.name: (lambda pretrained=True: m48)}
    lm, _ = _small_lm(n_q=m48.cfg.rvq.n_q, W=20)
    wav = np.random.RandomState(7).randn(1, 2 * 48000 + 3456)
    wav = (wav * 0.3).astype(np.float32)
    data = cmod.compress(m48, wav, use_lm=True, lm=lm, models=reg)
    meta = cmod.binary.read_ecdc_header(io.BytesIO(data))
    assert meta["lmv"] == 3 and len(meta["fl"]) > 1
    out, _ = cmod.decompress(data, models=reg, lm=lm)
    ref, _ = cmod.decompress(cmod.compress(m48, wav, models=reg),
                             models=reg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0, rtol=0)


def test_ecdc_lmv3_crc_catches_corruption():
    model, reg = _codec()
    lm, _ = _small_lm(n_q=model.cfg.rvq.n_q, W=20)
    wav = np.random.RandomState(8).randn(1, 6000).astype(np.float32) * 0.3
    data = cmod.compress(model, wav, use_lm=True, lm=lm, models=reg)
    f = io.BytesIO(data)
    cmod.binary.read_ecdc_header(f)
    payload0 = f.tell()
    payload_len = len(data) - payload0
    # flip one byte in the consumed body of the AC stream: either the
    # range decoder errors or the CRC gate must refuse — silent wrong
    # audio is the failure mode being excluded. (A flip in the final
    # byte's unused padding bits is legitimately harmless, so stay away
    # from the tail.)
    caught = 0
    positions = [payload0 + payload_len // 4, payload0 + payload_len // 2,
                 payload0 + (3 * payload_len) // 4]
    for pos in positions:
        bad = bytearray(data)
        bad[pos] ^= 0x10
        try:
            cmod.decompress(bytes(bad), models=reg, lm=lm)
        except Exception:
            caught += 1
    assert caught == len(positions)


def test_ecdc_lmv2_still_decodes():
    """portable=False writes the round-3 pinned format and the tier
    decoder still handles it."""
    model, reg = _codec()
    lm, _ = _small_lm(n_q=model.cfg.rvq.n_q, W=20)
    wav = np.random.RandomState(9).randn(1, 6000).astype(np.float32) * 0.3
    data = cmod.compress(model, wav, use_lm=True, lm=lm, models=reg,
                         portable=False)
    meta = cmod.binary.read_ecdc_header(io.BytesIO(data))
    assert meta["lmv"] == 2 and "cc" not in meta
    out, _ = cmod.decompress(data, models=reg, lm=lm)
    ref, _ = cmod.decompress(cmod.compress(model, wav, models=reg),
                             models=reg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dot_i8_decomposition_exact():
    """The balanced base-128 int8 MXU decomposition == plain integer dot."""
    rng = np.random.RandomState(11)
    a = jnp.asarray(rng.randint(-ilm.MM_CLIP, ilm.MM_CLIP + 1, (5, 800)),
                    jnp.int32)
    w = jnp.asarray(rng.randint(-127, 128, (800, 7)), jnp.int8)
    got = np.asarray(ilm._dot_i8(a, w))
    ref = np.asarray(a, np.int64) @ np.asarray(w, np.int64)
    assert np.array_equal(got, ref)


def test_table_contract_pins():
    """CRC-pin every LUT + derived constant: these ARE the lmv=3 format.
    If this test fails, you changed the bitstream — bump ILM_VERSION and
    the container 'lmv' instead of editing the pins."""
    import zlib

    def crc(a):
        return zlib.crc32(np.ascontiguousarray(a).tobytes()) & 0xFFFFFFFF

    pins = {
        "exp2": crc(ilm.exp2_table()),
        "sin": crc(ilm.sin_table()),
        "gelu": crc(ilm.gelu_table()),
        "invsqrt": crc(ilm.invsqrt_table()),
        "pos200": crc(ilm.pos_phase_steps(200, 10000.0)),
    }
    expected = {
        "exp2": 0xFFC99D30, "sin": 0x8E331FCF, "gelu": 0xB19D4276,
        "invsqrt": 0x7864271F, "pos200": 0x3ACB52E2,
    }
    assert pins == expected


@pytest.mark.slow
def test_lmv3_rate_cost_under_1pct_on_trained_lm():
    """Train the small LM briefly so the prior is informative, then
    compare lmv=3 vs lmv=2 AC payload bytes on held-out codes: the
    integer quantization must cost < 1% (VERDICT r3 item 1's bar)."""
    from encodec_tpu.train.lm_train import (create_lm_train_state,
                                            make_lm_train_step)
    cfg = LMConfig(n_q=4, card=64, dim=32, num_heads=4, num_layers=2,
                   past_context=40)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)

    def gen_codes(n, T):
        # strongly-structured synthetic codes: slow sinusoid drift + noise
        t = np.arange(T)
        base = (8 * np.sin(2 * np.pi * t / 37)[None, None, :]
                + 16 + rng.randn(n, cfg.n_q, T)).astype(np.int64)
        return np.clip(base, 0, cfg.card - 1).astype(np.int32)

    opt, opt_state = create_lm_train_state(params, lr=3e-3)
    step = make_lm_train_step(cfg, opt)
    for i in range(60):
        codes = jnp.asarray(gen_codes(8, 48))
        params, opt_state, metrics = step(params, opt_state, codes)
    lm = LMModel(cfg, params)

    model, reg = _codec()
    codes_eval = gen_codes(1, 120)[0]                    # [K, T]

    def payload(portable):
        fo = io.BytesIO()
        # go through the real writer on injected frames
        frames = [(jnp.asarray(codes_eval[None]), None)]
        cmod.compress_to_file(model, np.zeros((1, 24000), np.float32), fo,
                              use_lm=True, lm=lm, models=reg,
                              frames=frames, portable=portable)
        data = fo.getvalue()
        f = io.BytesIO(data)
        cmod.binary.read_ecdc_header(f)
        return len(data) - f.tell()

    p3, p2 = payload(True), payload(False)
    # integer-prior stream within 1% of the float-prior stream
    assert p3 <= p2 * 1.01 + 2, (p3, p2)
