"""Container-writing near-tie guard (VERDICT r3 #3).

Real trained RVQ codebooks produce razor-thin argmin margins (min 5.2e-6,
PARITY_REPORT.json trained_weights) where different precision modes or
platforms could legitimately pick different codes. The guard computes the
top-2 distance gap in-graph during `.ecdc` encoding and re-resolves
flagged positions on host in f64 with the reference association order —
writers whose encoder latents agree (same precision mode) emit identical
bytes; across modes a measured residual floor remains because the
latents themselves drift (probes/fast_writer.py), which is why 'fast' is
refused and 'high' writers get a widened mode-matched threshold.
"""

import importlib

import numpy as np
import jax.numpy as jnp

from encodec_tpu.models.model import build_model
from encodec_tpu.quant.rvq import rvq_encode, rvq_encode_margins, \
    resolve_ties_f64

cmod = importlib.import_module("encodec_tpu.stream.compress")


def _model(seed=0, bins=64):
    m = build_model([1.5, 3.0], sample_rate=24000, channels=1, causal=True,
                    model_norm="weight_norm", name="encodec_24khz",
                    ratios=[8, 5, 4, 2], bins=bins, dimension=16,
                    n_filters=4, seed=seed)
    m.set_target_bandwidth(1.5)
    return m, {m.name: (lambda pretrained=True: m)}


def test_margins_match_plain_encode():
    """rvq_encode_margins selects EXACTLY rvq_encode's codes and returns
    non-negative margins."""
    m, _ = _model()
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 9, m.cfg.rvq.dimension), jnp.float32)
    codes = np.asarray(rvq_encode(m.qstate, z, m.cfg.rvq, n_q=2))
    codes2, margins = rvq_encode_margins(m.qstate, z, m.cfg.rvq, n_q=2)
    np.testing.assert_array_equal(np.asarray(codes2), codes)
    assert float(jnp.min(margins)) >= 0.0


def test_forced_exact_tie_is_flagged_and_resolved():
    """Duplicate codebook rows => zero margin at every position selecting
    them; the guard must flag and resolve to the f64/first-index choice."""
    m, reg = _model(seed=3)
    # stage-0 codebook: rows 3 and 5 identical, everything else pushed far
    embed = np.array(m.qstate.embed)
    embed[0][:] = 1e3
    embed[0][3] = 0.05 * np.arange(m.cfg.rvq.dimension)
    embed[0][5] = embed[0][3]
    m.qstate = m.qstate._replace(embed=jnp.asarray(embed))

    wav = np.random.RandomState(4).randn(1, 3200).astype(np.float32) * 0.3
    frames, stats = m.encode_guarded(jnp.asarray(wav)[None])
    assert stats["n_flagged"] > 0
    assert stats["min_margin"] == 0.0
    codes = np.asarray(frames[0][0])[0]          # [K, T]
    # stage 0 must uniformly pick index 3 (first of the tied pair — the
    # reference association order)
    assert (codes[0] == 3).all(), codes[0]

    # the f64 resolver itself honors first-index ties
    z = np.asarray([embed[0][3]], np.float64)
    out = resolve_ties_f64(m.qstate, z, m.cfg.rvq, 1)
    assert out[0, 0] == 3


def test_writers_agree_across_precision_modes():
    """With the guard on, 'highest' and 'high' writers emit identical
    bytes (the certification VERDICT r3 #3 asks for)."""
    m, reg = _model(seed=5)
    wav = np.random.RandomState(6).randn(1, 4800).astype(np.float32) * 0.3
    data_highest = cmod.compress(m, wav, models=reg)
    m.set_precision("high")
    try:
        data_high = cmod.compress(m, wav, models=reg)
    finally:
        m.set_precision("highest")
    assert data_highest == data_high
    out, _ = cmod.decompress(data_high, models=reg)
    ref, _ = cmod.decompress(data_highest, models=reg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mode_matched_guard_threshold(monkeypatch):
    """compress() guards 'highest' writers at 1e-3 and 'high' writers at
    the widened 1e-2 (covers the measured 'high' latent-drift band,
    probes/fast_writer.py: one unflagged 48 kHz flip at 1e-3, zero at
    1e-2)."""
    m, reg = _model(seed=9)
    wav = np.random.RandomState(10).randn(1, 3200).astype(np.float32) * 0.3
    captured = {}
    orig = type(m).encode_guarded

    def spy(self, x, threshold=1e-3):
        captured["thr"] = threshold
        return orig(self, x, threshold=threshold)

    monkeypatch.setattr(type(m), "encode_guarded", spy)
    cmod.compress(m, wav, models=reg)
    assert captured["thr"] == 1e-3
    m.set_precision("high")
    try:
        cmod.compress(m, wav, models=reg)
    finally:
        m.set_precision("highest")
    assert captured["thr"] == 1e-2


def test_guard_stats_and_output_contract():
    """Stats are populated and guarded output always decodes to the same
    audio as the unguarded writer; bytes are identical whenever nothing
    was flagged. (Tiny test models CAN have sub-threshold margins —
    production codebooks sit ~4 orders of magnitude above the threshold,
    PARITY_REPORT.json — so byte equality is asserted conditionally.)"""
    m, reg = _model(seed=7)
    wav = np.random.RandomState(8).randn(1, 3200).astype(np.float32) * 0.3
    frames, stats = m.encode_guarded(jnp.asarray(wav)[None])
    # tiny k-means-initialized codebooks contain DUPLICATE rows (the
    # wrap-around init), so exact-zero margins are legitimate here
    assert stats["min_margin"] >= 0.0
    assert stats["n_positions"] > 0
    guarded = cmod.compress(m, wav, models=reg)
    unguarded = cmod.compress(m, wav, models=reg, tie_guard=False)
    if stats["n_changed"] == 0:
        assert guarded == unguarded
    out_g, _ = cmod.decompress(guarded, models=reg)
    out_u, _ = cmod.decompress(unguarded, models=reg)
    # flagged positions are BELOW-noise near-ties: either code decodes to
    # audio within reconstruction tolerance
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_u),
                               atol=2e-2)


def test_guarded_segmented_model():
    """Segmented + normalized (48 kHz-style) models go through the guard's
    per-group loop; frames stay decode-compatible."""
    m48 = build_model([3.0], sample_rate=48000, channels=1, causal=False,
                      model_norm="time_group_norm", name="encodec_48khz",
                      ratios=[8, 5, 4, 2], bins=64, dimension=16,
                      n_filters=4, audio_normalize=True, segment=1.0)
    m48.set_target_bandwidth(3.0)
    reg = {m48.name: (lambda pretrained=True: m48)}
    wav = np.random.RandomState(9).randn(1, 100_000)
    wav = (wav * 0.3).astype(np.float32)
    data = cmod.compress(m48, wav, models=reg)
    out, sr = cmod.decompress(data, models=reg)
    assert out.shape == (1, 100_000) and sr == 48000
