"""Distance-margin audit for RVQ argmin decisions (SURVEY §7.4 mitigation).

BASELINE.md's north star — exact RVQ code indices vs the PUBLISHED PyTorch
checkpoints at 1.5–24 kbps — cannot *execute* in this container: there is
no network egress and no local mirror of `encodec_24khz-d7cc33bc.th` /
`encodec_48khz-7e698e3e.th` (ref model.py:331-342). The well-built suite
in tests/test_real_checkpoints.py skips here for exactly that reason.

This module is the prescribed fallback (VERDICT r2, next-step #1c): on
FULL-SIZE synthetic models (the real 24 kHz / 48 kHz architectures with
seeded random weights) driven by the reference's own wav fixtures, it
quantifies how far every nearest-codebook decision sits from a tie:

- **margin**: `d(2nd best) − d(best)` per position and RVQ stage, computed
  in float64 from the torch oracle's own f32 residual chain — the distance
  the decision would have to move to flip;
- **perturbation**: `max |d_jax − d_torch|` over every (position, codebook
  entry) pair, where each side computes its *actual* f32 distances from
  its *own* encoder/residual chain — the total cross-implementation
  numerical disagreement accumulated through conv/LSTM/RVQ;
- **safety factor**: `min_margin / (2 · max_perturbation)` — a decision can
  only flip once the perturbation reaches half the margin, so a factor of
  S means distances would need to disagree S× more than they ever do
  before the first code mismatch could occur.

It also audits the Pallas fused kernel against the XLA parity path
(VERDICT r2 #7): flip count and the margins at any flip site (exact ties).

Run `python -m tests.margin_audit` to regenerate /root/repo/PARITY_REPORT.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import ref_loader
from tests.test_real_checkpoints import _load_wav, WAVS

ref_seanet = ref_loader.load("encodec.modules.seanet")
core_vq = ref_loader.load("encodec.quantization.core_vq")
ref_vq = ref_loader.load("encodec.quantization.vq")


# ---------------------------------------------------------------------------
# Model construction (full-size synthetic weights)
# ---------------------------------------------------------------------------

def build_pair(name: str, *, seed: int = 0, dimension=128, n_filters=32,
               ratios=(8, 5, 4, 2), bins=1024, n_q=32):
    """(torch pieces, our EncodecModel) at the real architecture size with
    seeded random weights — upstream-independent per-stage codebooks."""
    causal = name == "encodec_24khz"
    norm = "weight_norm" if causal else "time_group_norm"
    channels = 1 if causal else 2
    sample_rate = 24_000 if causal else 48_000
    torch.manual_seed(seed)
    enc = ref_seanet.SEANetEncoder(channels=channels, dimension=dimension,
                                   n_filters=n_filters, ratios=list(ratios),
                                   causal=causal, norm=norm)
    dec = ref_seanet.SEANetDecoder(channels=channels, dimension=dimension,
                                   n_filters=n_filters, ratios=list(ratios),
                                   causal=causal, norm=norm)
    quant = ref_vq.ResidualVectorQuantizer(dimension=dimension, n_q=n_q,
                                           bins=bins, codebook_dim=dimension,
                                           kmeans_init=False)
    quant.vq.layers = torch.nn.ModuleList(
        [core_vq.VectorQuantization(dim=dimension, codebook_size=bins,
                                    codebook_dim=dimension,
                                    kmeans_init=False)
         for _ in range(n_q)])
    # random-init codebooks are uniform(0,1) kaiming buffers; give them the
    # scale of real latents so distances/margins resemble a trained model
    with torch.no_grad():
        for layer in quant.vq.layers:
            layer._codebook.embed.mul_(4.0).sub_(2.0)
    for m in (enc, dec, quant):
        m.eval()
    state = {}
    for root, m in [("encoder.", enc), ("decoder.", dec),
                    ("quantizer.", quant)]:
        for k, v in m.state_dict().items():
            state[root + k] = v.detach().numpy()

    from encodec_tpu.models.model import build_model, EncodecModel
    from encodec_tpu.models.torch_zoo import model_params_from_torch
    import dataclasses
    model = build_model(
        [1.5, 3.0, 6.0, 12.0, 24.0] if causal else [3.0, 6.0, 12.0, 24.0],
        sample_rate=sample_rate, channels=channels, causal=causal,
        model_norm=norm, audio_normalize=not causal,
        segment=None if causal else 1.0, name=name, ratios=list(ratios),
        bins=bins, dimension=dimension, n_filters=n_filters,
        decoder_final_norm="none")
    rvq = dataclasses.replace(model.cfg.rvq, n_q=n_q)
    cfg = dataclasses.replace(model.cfg, rvq=rvq)
    params, qstate = model_params_from_torch(state, cfg)
    return (enc, dec, quant), EncodecModel(cfg, params, qstate)


# ---------------------------------------------------------------------------
# Instrumented residual chains (distances exposed per stage)
# ---------------------------------------------------------------------------

def torch_chain(quant, emb_t: torch.Tensor, n_q: int):
    """Reference residual chain (core_vq.py:385-445 inference semantics):
    f32 distances in the reference association order, f64 ground-truth
    margins from the same f32 residuals.

    Returns (codes [K, N], dist_f32 [K, N, bins], margin_f64 [K, N]).
    """
    # EuclideanCodebook.quantize flattens [B, T, D] -> [N, D]
    flat = emb_t.transpose(1, 2).reshape(-1, emb_t.shape[1])   # [N, D]
    residual = flat
    codes, dists, margins = [], [], []
    with torch.no_grad():
        for k in range(n_q):
            embed = quant.vq.layers[k]._codebook.embed          # [bins, D]
            # reference association order (core_vq.py:181-193)
            d = -(residual.pow(2).sum(1, keepdim=True)
                  - 2 * residual @ embed.t()
                  + embed.t().pow(2).sum(0, keepdim=True))
            idx = d.max(dim=-1).indices                         # first-max
            r64 = residual.double()
            e64 = embed.double()
            d64 = (r64.pow(2).sum(1, keepdim=True)
                   - 2 * r64 @ e64.t()
                   + e64.t().pow(2).sum(0, keepdim=True))
            top2 = torch.topk(d64, 2, dim=-1, largest=False).values
            codes.append(idx.numpy())
            dists.append((-d).numpy())                          # +distances
            margins.append((top2[:, 1] - top2[:, 0]).numpy())
            residual = residual - embed[idx]
    return (np.stack(codes), np.stack(dists), np.stack(margins))


def jax_chain(model, emb: jnp.ndarray, n_q: int,
              precision=jax.lax.Precision.HIGHEST,
              return_residuals: bool = False):
    """Our residual chain exactly as quant/rvq.rvq_encode computes it
    (f32, selectable matmul precision), with distances exposed.

    emb: [B, T, D]. Returns (codes [K, N], dist_f32 [K, N, bins]) and,
    when requested, the per-stage input residuals [K, N, D].
    """
    state = model.qstate
    D = emb.shape[-1]
    flat = emb.reshape(-1, D)
    embeds = state.embed
    if embeds.shape[0] == 1 and n_q > 1:      # shared codebook (fork quirk)
        embeds = jnp.broadcast_to(embeds, (n_q,) + embeds.shape[1:])

    @jax.jit
    def run(flat, embeds):
        def step(residual, embed_k):
            d = (jnp.sum(jnp.square(residual), axis=1, keepdims=True)
                 - 2.0 * jnp.dot(residual, embed_k.T, precision=precision)
                 + jnp.sum(jnp.square(embed_k.T), axis=0, keepdims=True))
            idx = jnp.argmax(-d, axis=-1)
            return residual - embed_k[idx], (idx, d, residual)

        _, (codes, dists, residuals) = jax.lax.scan(step, flat, embeds)
        return codes, dists, residuals

    codes, dists, residuals = run(flat, embeds[:n_q])
    if return_residuals:
        return np.asarray(codes), np.asarray(dists), np.asarray(residuals)
    return np.asarray(codes), np.asarray(dists)


def our_embeddings(model, x: np.ndarray,
                   precision=jax.lax.Precision.HIGHEST,
                   lowering: str = "mxu") -> jnp.ndarray:
    """Encoder output [B, T', D] for a [B, C, T] input via our SEANet."""
    from encodec_tpu.models.seanet import seanet_encoder
    xt = jnp.transpose(jnp.asarray(x), (0, 2, 1))
    fn = jax.jit(lambda p, x: seanet_encoder(
        p, x, model.cfg.seanet, precision=precision, lowering=lowering))
    return fn(model.params["encoder"], xt)


# ---------------------------------------------------------------------------
# Audits
# ---------------------------------------------------------------------------

def audit_codec(name: str, *, seconds: int = 3, seed: int = 0,
                n_q: int = 32) -> dict:
    (enc, dec, quant), model = build_pair(name, seed=seed, n_q=n_q)
    wav, sr = _load_wav(WAVS[name])
    assert sr == model.sample_rate
    wav = wav[:, :sr * seconds]
    xt = torch.from_numpy(wav)[None]

    seg_len = model.segment_length or wav.shape[-1]
    stride = model.segment_stride or wav.shape[-1]

    report: dict = {"model": name, "seconds": seconds, "seed": seed,
                    "n_q": n_q, "segments": 0, "bandwidth_code_match": {},
                    "stages": []}

    # ---- exact-code parity at every served bandwidth ----
    bandwidths = model.target_bandwidths
    for bw in bandwidths:
        model.set_target_bandwidth(bw)
        frames = model.encode(jnp.asarray(wav)[None])
        mism = total = 0
        for i, off in enumerate(range(0, wav.shape[-1], stride)):
            seg = xt[:, :, off:off + seg_len]
            seg_n = seg
            if model.normalize:
                mono = seg.mean(dim=1, keepdim=True)
                volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
                seg_n = seg / (1e-8 + volume)
            with torch.no_grad():
                emb_t = enc(seg_n)
                codes_ref = quant.encode(
                    emb_t, model.frame_rate, bw).numpy()      # [K, B, T]
            ours = np.asarray(frames[i][0])
            mism += int((ours != codes_ref.transpose(1, 0, 2)).sum())
            total += int(ours.size)
        report["bandwidth_code_match"][str(bw)] = {
            "codes": total, "mismatches": mism}

    # ---- margins & perturbation at full depth (covers all stages) ----
    # Perturbation is measured DIFFERENTIALLY, relative to the chosen
    # entry: d_j = ||r||² - 2 r·e_j + ||e_j||² shares the ||r||² term
    # across all j, so any error there shifts every distance equally and
    # can never flip an argmin — only |Δ(d_j - d_best)| matters.
    all_margin_mins, all_pert_maxes, all_ratio_mins = [], [], []
    at_risk_total = 0
    n_segments = 0
    for off in range(0, wav.shape[-1], stride):
        seg = xt[:, :, off:off + seg_len]
        seg_n = seg
        if model.normalize:
            mono = seg.mean(dim=1, keepdim=True)
            volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
            seg_n = seg / (1e-8 + volume)
        with torch.no_grad():
            emb_t = enc(seg_n)                                # [B, D, T']
        emb_j = our_embeddings(model, seg_n.numpy())          # [B, T', D]
        codes_t, dist_t, margin64 = torch_chain(quant, emb_t, n_q)
        codes_j, dist_j = jax_chain(model, emb_j, n_q)
        assert codes_t.shape == codes_j.shape
        N = codes_t.shape[1]
        rows = np.arange(N)
        seg_stats = []
        for k in range(n_q):
            best = codes_t[k]                                  # [N]
            rel_t = dist_t[k] - dist_t[k][rows, best][:, None]  # [N, bins]
            rel_j = dist_j[k] - dist_j[k][rows, best][:, None]
            pert_k = np.abs(rel_j - rel_t)                      # [N, bins]
            pert_pos = pert_k.max(axis=1)                       # [N]
            at_risk = int((pert_pos >= margin64[k] / 2).sum())
            ratio = (margin64[k] / (2.0 * np.maximum(pert_pos, 1e-300)))
            seg_stats.append({
                "stage": k,
                "code_mismatches": int((codes_t[k] != codes_j[k]).sum()),
                "min_margin": float(margin64[k].min()),
                "p1_margin": float(np.percentile(margin64[k], 1)),
                "median_margin": float(np.median(margin64[k])),
                "max_perturbation": float(pert_pos.max()),
                "at_risk_positions": at_risk,
                "min_safety_ratio": float(ratio.min()),
            })
            all_ratio_mins.append(ratio.min())
            at_risk_total += at_risk
        if n_segments == 0:
            report["stages"] = seg_stats
        else:  # fold later segments in (min/max across segments)
            for s, new in zip(report["stages"], seg_stats):
                s["code_mismatches"] += new["code_mismatches"]
                s["min_margin"] = min(s["min_margin"], new["min_margin"])
                s["max_perturbation"] = max(s["max_perturbation"],
                                            new["max_perturbation"])
                s["at_risk_positions"] += new["at_risk_positions"]
                s["min_safety_ratio"] = min(s["min_safety_ratio"],
                                            new["min_safety_ratio"])
        all_margin_mins.append(margin64.min())
        all_pert_maxes.append(max(s["max_perturbation"] for s in seg_stats))
        n_segments += 1

    report["segments"] = n_segments
    report["min_margin"] = float(min(all_margin_mins))
    report["max_differential_perturbation"] = float(max(all_pert_maxes))
    # a decision can only flip when the differential perturbation reaches
    # half its position's margin; the global factor is the worst per-
    # position ratio (NOT global-min-margin / global-max-pert, which pairs
    # unrelated positions)
    report["safety_factor"] = float(min(all_ratio_mins))
    report["at_risk_positions"] = int(at_risk_total)
    report["total_code_mismatches"] = int(
        sum(s["code_mismatches"] for s in report["stages"]))
    return report


def audit_precision(name: str, *, mode: str = "high", seconds: int = 3,
                    seed: int = 0, n_q: int = 32) -> dict:
    """Bitstream-safety audit for a reduced MXU precision mode.

    'highest' (bf16×6 f32 emulation) is the parity-proof default; 'high'
    (bf16×3) halves matmul passes. This audit measures, on the FULL-SIZE
    model driven by the reference wav fixture:

    - full-pipeline RVQ code flips vs the 'highest' path at every served
      bandwidth (the quantity that decides `.ecdc` byte equality);
    - the differential distance perturbation of the `mode` chain against
      f64 ground-truth margins computed from the 'highest' chain's own
      residuals (same differential methodology as audit_codec — the
      common ‖r‖² term cancels in any argmin).

    A safety factor of S means the mode's distances would need to disagree
    S× more than they ever do before the first code flip could occur.
    """
    _, model = build_pair(name, seed=seed, n_q=n_q)
    wav, sr = _load_wav(WAVS[name])
    assert sr == model.sample_rate
    wav = wav[:, :sr * seconds]
    x = jnp.asarray(wav)[None]

    report: dict = {"model": name, "mode": mode, "seconds": seconds,
                    "seed": seed, "n_q": n_q,
                    "bandwidth_code_match": {}}

    for bw in model.target_bandwidths:
        model.set_target_bandwidth(bw)
        model.set_precision("highest")
        f_hi = [(np.asarray(c), s) for c, s in model.encode(x)]
        model.set_precision(mode)
        f_lo = [(np.asarray(c), s) for c, s in model.encode(x)]
        mism = sum(int((a[0] != b[0]).sum()) for a, b in zip(f_hi, f_lo))
        total = sum(int(a[0].size) for a in f_hi)
        report["bandwidth_code_match"][str(bw)] = {
            "codes": total, "mismatches": mism}
    model.set_precision("highest")

    prec = {"high": jax.lax.Precision.HIGH,
            "fast": jax.lax.Precision.DEFAULT}[mode]
    seg_len = model.segment_length or wav.shape[-1]
    stride = model.segment_stride or wav.shape[-1]
    xt = torch.from_numpy(wav)[None]
    ratio_mins, pert_maxes, margin_mins = [], [], []
    flips_full_depth = at_risk = 0
    for off in range(0, wav.shape[-1], stride):
        seg = xt[:, :, off:off + seg_len]
        seg_n = seg
        if model.normalize:
            mono = seg.mean(dim=1, keepdim=True)
            volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
            seg_n = seg / (1e-8 + volume)
        emb_hi = our_embeddings(model, seg_n.numpy())
        # the mode chain includes the VPU shift lowering the model's
        # 'high'/'fast' encode jits actually use (set_precision)
        emb_lo = our_embeddings(model, seg_n.numpy(), precision=prec,
                                lowering="auto")
        codes_hi, dist_hi, res_hi = jax_chain(model, emb_hi, n_q,
                                              return_residuals=True)
        codes_lo, dist_lo = jax_chain(model, emb_lo, n_q, precision=prec)
        flips_full_depth += int((codes_hi != codes_lo).sum())
        N = codes_hi.shape[1]
        rows = np.arange(N)
        embeds = np.asarray(model.qstate.embed[:n_q], np.float64)
        for k in range(n_q):
            # f64 ground-truth margins from the highest chain's residuals
            r64 = res_hi[k].astype(np.float64)                 # [N, D]
            d64 = ((r64 * r64).sum(1, keepdims=True)
                   - 2.0 * r64 @ embeds[k].T
                   + (embeds[k] * embeds[k]).sum(1)[None, :])  # [N, bins]
            part = np.partition(d64, 1, axis=1)
            margin64 = part[:, 1] - part[:, 0]                 # [N]
            best = codes_hi[k]
            rel_hi = dist_hi[k] - dist_hi[k][rows, best][:, None]
            rel_lo = dist_lo[k] - dist_lo[k][rows, best][:, None]
            pert_pos = np.abs(rel_lo - rel_hi).max(axis=1)     # [N]
            ratio = margin64 / (2.0 * np.maximum(pert_pos, 1e-300))
            ratio_mins.append(float(ratio.min()))
            pert_maxes.append(float(pert_pos.max()))
            margin_mins.append(float(margin64.min()))
            at_risk += int((pert_pos >= margin64 / 2).sum())

    report["full_depth_code_flips"] = int(flips_full_depth)
    report["min_margin"] = float(min(margin_mins))
    report["max_differential_perturbation"] = float(max(pert_maxes))
    # capped so identical numerics (e.g. CPU, where every precision mode is
    # true f32) stay strict-JSON instead of Infinity
    report["safety_factor"] = float(min(min(ratio_mins), 1e12))
    report["at_risk_positions"] = int(at_risk)
    report["total_bandwidth_mismatches"] = int(sum(
        v["mismatches"] for v in report["bandwidth_code_match"].values()))
    return report


# Structurally distinct training configurations for the trained-margin
# audit (VERDICT r4 #5): the 24 kHz-causal shape trains different
# normalization statistics than the 48 kHz path (time_group_norm,
# non-causal, segments + per-segment volume normalize, ref
# model.py:364-382) or the breathing config (ConvLayerNorm, SHARED
# codebook across stages, deep ratio stack, ref core_vq.py:370-374,
# params/091224_l1.yaml) — so margins / safety factors / tie-guard
# thresholds are validated per config, at reduced size.
TRAINED_VARIANTS: dict = {
    "causal24": dict(causal=True, model_norm="weight_norm", channels=1,
                     ratios=[5, 2, 1], segment=None, audio_normalize=False,
                     shared_codebook=False, t_val=600),
    "seg48": dict(causal=False, model_norm="time_group_norm", channels=2,
                  ratios=[5, 2, 1], segment=20.0, audio_normalize=True,
                  shared_codebook=False, t_val=600),
    "breathing": dict(causal=True, model_norm="layer_norm", channels=1,
                      ratios=[6, 5, 2], segment=None, audio_normalize=False,
                      shared_codebook=True, t_val=3000),
}

# the container-writer near-tie guard threshold these audits validate
# (models/model.py::encode_guarded default)
GUARD_THRESHOLD = 1e-3


def audit_trained(*, steps: int = 200, seed: int = 0,
                  val_batches: int = 4,
                  variant: str = "causal24") -> dict:
    """Margin audit on TRAINED weights — the regime SURVEY §7.4 flags as
    invisible to random-weight audits: EMA-trained codebooks tile the
    latent distribution, so argmin margins come from real cluster
    boundaries instead of random-Gaussian geometry.

    Pipeline: train a small codec in the `variant` configuration (see
    `TRAINED_VARIANTS` — 24 kHz-causal, 48 kHz-style segmented/normalized
    time_group_norm, or breathing-style shared-codebook layer_norm; all
    with the real k-means + EMA `train/steps.py` gen step) on synthetic
    breathing-like signals; export the trained weights into the
    REFERENCE's own torch modules via `torch_zoo.torch_state_from_params`
    + `load_state_dict`; then run the exact-code and differential-
    perturbation analysis of `audit_codec` on held-out signals, per
    segment where the variant segments, and validate the near-tie guard
    threshold against the measured margins/perturbations.
    """
    from encodec_tpu.models.model import build_model
    from encodec_tpu.models.torch_zoo import torch_state_from_params
    from encodec_tpu.train.steps import (create_train_state,
                                         make_train_steps, LossWeights)

    v = TRAINED_VARIANTS[variant]
    channels = v["channels"]
    shared = v["shared_codebook"]
    model = build_model([0.08], sample_rate=10, channels=channels,
                        causal=v["causal"], model_norm=v["model_norm"],
                        audio_normalize=v["audio_normalize"],
                        segment=v["segment"],
                        name=f"trained_audit_{variant}",
                        ratios=v["ratios"], bins=32, dimension=16,
                        n_filters=4, decoder_final_norm="none",
                        shared_codebook=shared, kmeans_init=True, seed=seed)
    n_q = model.cfg.rvq.n_q
    state, _, _ = create_train_state(model, None, seed=seed)
    gen_step, _, _, _ = make_train_steps(
        model.cfg, None,
        freq_loss_kwargs=dict(n_fft=64, win_length=64, hop_length=16,
                              sampling_rate=10, alpha=0.01, bandwidth=None))
    weights = LossWeights.make(l1=1.0, freq=0.25, commit=0.25, lr=1e-3)

    rng = np.random.RandomState(seed)

    def batch(n=4, T=600):
        t = np.arange(T) / 10.0
        f = rng.uniform(0.15, 0.4, size=(n, 1, 1))
        ph = rng.uniform(0, 2 * np.pi, size=(n, 1, channels))
        amp = rng.uniform(0.6, 1.4, size=(n, 1, channels))
        sig = amp * np.sin(2 * np.pi * f * t[None, :, None] + ph) + \
            0.05 * rng.randn(n, T, channels)
        return jnp.asarray(sig, jnp.float32)                  # [B, T, C]

    first_loss = None
    for i in range(steps):
        state, metrics = gen_step(state, batch(), weights, False)
        if i == 0:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    model.params, model.qstate = state.params, state.qstate

    # export into the reference's own modules
    sd = torch_state_from_params(model.params, model.qstate, model.cfg)
    enc = ref_seanet.SEANetEncoder(channels=channels, dimension=16,
                                   n_filters=4, ratios=list(v["ratios"]),
                                   causal=v["causal"], norm=v["model_norm"])
    quant = ref_vq.ResidualVectorQuantizer(dimension=16, n_q=n_q, bins=32,
                                           codebook_dim=16, kmeans_init=False)
    if not shared:
        # upstream layout: independent per-stage codebooks; shared keeps
        # the fork's default single reused VQ instance (core_vq.py:370-374)
        quant.vq.layers = torch.nn.ModuleList(
            [core_vq.VectorQuantization(dim=16, codebook_size=32,
                                        codebook_dim=16, kmeans_init=False)
             for _ in range(n_q)])
    for root, m in [("encoder.", enc), ("quantizer.", quant)]:
        sub = {k[len(root):]: torch.from_numpy(np.ascontiguousarray(v2))
               for k, v2 in sd.items() if k.startswith(root)}
        missing, unexpected = m.load_state_dict(sub, strict=False)
        assert not unexpected, (root, unexpected)
        m.eval()

    report: dict = {"model": f"trained_audit_{variant}",
                    "variant": variant, "train_steps": steps,
                    "seed": seed, "n_q": n_q,
                    "train_loss_first": first_loss,
                    "train_loss_last": last_loss,
                    "bandwidth_code_match": {}, "stages": []}

    model.set_target_bandwidth(0.08)
    T_val = v["t_val"]
    seg_len = model.segment_length or T_val
    stride = model.segment_stride or T_val
    ratio_mins, pert_maxes, margin_mins = [], [], []
    at_risk_total = mism_total = codes_total = 0
    for b in range(val_batches):
        x = np.asarray(batch(n=2, T=T_val))                   # [B, T, C]
        xt_full = torch.from_numpy(np.transpose(x, (0, 2, 1)))  # [B, C, T]
        frames = model.encode(jnp.asarray(xt_full.numpy()))
        offsets = list(range(0, T_val, stride))
        assert len(frames) == len(offsets)
        emb_ts, emb_js = [], []
        for si, off in enumerate(offsets):
            seg = xt_full[:, :, off:off + seg_len]
            seg_n = seg
            if model.normalize:
                mono = seg.mean(dim=1, keepdim=True)
                volume = mono.pow(2).mean(dim=2, keepdim=True).sqrt()
                seg_n = seg / (1e-8 + volume)
            with torch.no_grad():
                emb_t = enc(seg_n)                            # [B, D, T']
                codes_ref = quant.encode(emb_t, model.frame_rate,
                                         0.08).numpy()        # [K, B, T']
            ours = np.asarray(frames[si][0])
            mism_total += int((ours != codes_ref.transpose(1, 0, 2)).sum())
            codes_total += int(ours.size)
            emb_ts.append(emb_t)
            emb_js.append(our_embeddings(model, seg_n.numpy()))
        # margin/perturbation analysis over all segments at once
        emb_t = torch.cat(emb_ts, dim=2)
        emb_j = jnp.concatenate(emb_js, axis=1)

        codes_t, dist_t, margin64 = torch_chain(quant, emb_t, n_q)
        codes_j, dist_j = jax_chain(model, emb_j, n_q)
        N = codes_t.shape[1]
        rows = np.arange(N)
        # tie-guard accounting: a position is flagged (host-re-resolved
        # by encode_guarded) when ANY stage margin falls under the
        # threshold; the guard covers a precision mode iff that mode's
        # perturbation stays below threshold/2 at unflagged positions
        guard_flagged_total = report.get("guard_flagged_positions", 0)
        report["guard_flagged_positions"] = guard_flagged_total + int(
            (margin64 < GUARD_THRESHOLD).any(axis=0).sum())
        report["guard_positions"] = report.get("guard_positions", 0) + N
        stage_stats = []
        for k in range(n_q):
            best = codes_t[k]
            rel_t = dist_t[k] - dist_t[k][rows, best][:, None]
            rel_j = dist_j[k] - dist_j[k][rows, best][:, None]
            pert_pos = np.abs(rel_j - rel_t).max(axis=1)
            ratio = margin64[k] / (2.0 * np.maximum(pert_pos, 1e-300))
            at_risk_total += int((pert_pos >= margin64[k] / 2).sum())
            stage_stats.append({
                "stage": k,
                "code_mismatches": int((codes_t[k] != codes_j[k]).sum()),
                "min_margin": float(margin64[k].min()),
                "median_margin": float(np.median(margin64[k])),
                "max_perturbation": float(pert_pos.max()),
                "min_safety_ratio": float(min(ratio.min(), 1e12)),
            })
            ratio_mins.append(float(ratio.min()))
            pert_maxes.append(float(pert_pos.max()))
            margin_mins.append(float(margin64[k].min()))
        if b == 0:
            report["stages"] = stage_stats
        else:
            for s, new in zip(report["stages"], stage_stats):
                s["code_mismatches"] += new["code_mismatches"]
                s["min_margin"] = min(s["min_margin"], new["min_margin"])
                s["max_perturbation"] = max(s["max_perturbation"],
                                            new["max_perturbation"])
                s["min_safety_ratio"] = min(s["min_safety_ratio"],
                                            new["min_safety_ratio"])

    report["bandwidth_code_match"]["0.08"] = {
        "codes": codes_total, "mismatches": mism_total}
    report["min_margin"] = float(min(margin_mins))
    report["max_differential_perturbation"] = float(max(pert_maxes))
    report["safety_factor"] = float(min(min(ratio_mins), 1e12))
    report["at_risk_positions"] = int(at_risk_total)
    report["total_code_mismatches"] = int(
        mism_total + sum(s["code_mismatches"] for s in report["stages"]))
    report["guard_threshold"] = GUARD_THRESHOLD
    report["guard_flagged_fraction"] = (
        report["guard_flagged_positions"] / max(1, report["guard_positions"]))
    # the cross-implementation perturbation this audit measures must sit
    # well inside the guard threshold for unflagged positions to be safe
    report["guard_covers_measured_perturbation"] = bool(
        report["max_differential_perturbation"] < GUARD_THRESHOLD / 2)
    return report


def audit_pallas(name: str = "encodec_24khz", *, seconds: int = 3,
                 seed: int = 0, n_q: int = 32) -> dict:
    """Fused-kernel tie audit (VERDICT r2 #7): XLA vs pallas_fused codes on
    the same latents; any flip site's f64 margin (expected ≈ 0 — an exact
    tie) is recorded. Requires a TPU; on CPU hosts the kernel falls back to
    interpret mode on a truncated input."""
    (_, _, quant), model = build_pair(name, seed=seed, n_q=n_q)
    wav, sr = _load_wav(WAVS[name])
    wav = wav[:, :sr * seconds]
    emb = our_embeddings(model, wav[None])
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if not on_tpu:
        emb = emb[:, :16]                       # interpret mode is slow
    flat = emb.reshape(-1, emb.shape[-1])

    from encodec_tpu.quant.rvq import rvq_encode
    from encodec_tpu.kernels import rvq_encode_pallas
    codes_xla = np.asarray(rvq_encode(model.qstate, emb, model.cfg.rvq,
                                      n_q=n_q)).reshape(n_q, -1)
    codes_pal = np.asarray(rvq_encode_pallas(
        flat, model.qstate.embed, n_q=n_q, interpret=not on_tpu))

    flips = []
    if (codes_xla != codes_pal).any():
        # recompute the f64 margin at each flip site from the torch chain
        ks, ns = np.nonzero(codes_xla != codes_pal)
        residual = torch.from_numpy(np.asarray(flat))
        for k in range(n_q):
            embed = quant.vq.layers[k]._codebook.embed
            here = ns[ks == k]
            if here.size:
                r64 = residual[here].double()
                e64 = embed.double()
                d64 = (r64.pow(2).sum(1, keepdim=True) - 2 * r64 @ e64.t()
                       + e64.t().pow(2).sum(0, keepdim=True))
                top2 = torch.topk(d64, 2, dim=-1, largest=False).values
                for pos, m in zip(here.tolist(),
                                  (top2[:, 1] - top2[:, 0]).tolist()):
                    flips.append({"stage": k, "pos": pos,
                                  "margin_f64": float(m)})
            idx = torch.from_numpy(codes_xla[k])
            residual = residual - embed[idx]
    return {
        "model": name, "n_q": n_q, "positions": int(codes_xla.shape[1]),
        "platform": jax.devices()[0].platform,
        "interpret_mode": not on_tpu,
        "total_codes": int(codes_xla.size),
        "flips": len(flips),
        "flip_sites": flips[:64],
        "max_flip_margin_f64": (max(f["margin_f64"] for f in flips)
                                if flips else None),
    }


def network_evidence() -> dict:
    """Document the real-checkpoint impossibility with live evidence."""
    url = "https://dl.fbaipublicfiles.com/encodec/v0/encodec_24khz-d7cc33bc.th"
    try:
        import urllib.request
        urllib.request.urlopen(url, timeout=5)
        return {"egress": True, "note": "network reachable — run "
                "tests/test_real_checkpoints.py instead of this fallback"}
    except Exception as exc:
        err = f"{type(exc).__name__}: {exc}"
    repo = os.environ.get("ENCODEC_TPU_REPOSITORY")
    return {
        "egress": False,
        "error": err,
        "local_mirror": repo or None,
        "conclusion": (
            "published checkpoints unreachable: tests/test_real_checkpoints"
            ".py (exact codes at every bandwidth, .ecdc byte-equality) "
            "skips; this margin audit is the prescribed fallback "
            "(SURVEY §7.4)."),
    }


def audit_trained_sweep(step_counts=(50, 200, 800), seed: int = 0) -> list:
    """Map how argmin margins shrink with training convergence (VERDICT
    r3 #9's standing extension): run `audit_trained` at increasing
    training lengths and summarize min margin / safety / mismatches per
    length. Until the published checkpoints are reachable, this is the
    best available evidence for where REAL converged codebooks sit
    relative to the near-tie guard threshold.

    Append the result to PARITY_REPORT.json as `trained_margin_vs_length`
    via:  python -m tests.margin_audit --trained-sweep
    """
    out = []
    for steps in step_counts:
        print(f"audit_trained steps={steps} ...", flush=True)
        r = audit_trained(steps=steps, seed=seed)
        out.append({
            "train_steps": steps,
            "train_loss_last": r["train_loss_last"],
            "serving_code_mismatches": r["bandwidth_code_match"].get(
                "mismatches", r.get("total_code_mismatches", 0)),
            "min_margin": r["min_margin"],
            "median_margin_stage0": r["stages"][0]["median_margin"],
            "max_perturbation": r["max_differential_perturbation"],
            "safety_factor": r["safety_factor"],
            "at_risk_positions": r["at_risk_positions"],
        })
        print(f"  loss={out[-1]['train_loss_last']:.3f} "
              f"min_margin={out[-1]['min_margin']:.3e} "
              f"safety={out[-1]['safety_factor']:.2f}x "
              f"mismatches={out[-1]['serving_code_mismatches']}",
              flush=True)
    return out


def audit_trained_variants(steps: int = 300, seed: int = 0) -> dict:
    """Trained-margin audit across the structurally distinct configs
    (VERDICT r4 #5): per-config margin/safety tables + tie-guard
    threshold validation. Append to PARITY_REPORT.json as
    `trained_margin_by_config` via:
        python -m tests.margin_audit --trained-variants
    """
    out = {}
    for variant in TRAINED_VARIANTS:
        print(f"audit_trained variant={variant} steps={steps} ...",
              flush=True)
        r = audit_trained(steps=steps, seed=seed, variant=variant)
        out[variant] = {
            "train_steps": steps,
            "train_loss_last": r["train_loss_last"],
            "serving_code_mismatches":
                r["bandwidth_code_match"]["0.08"]["mismatches"],
            "total_codes": r["bandwidth_code_match"]["0.08"]["codes"],
            "min_margin": r["min_margin"],
            "median_margin_stage0": r["stages"][0]["median_margin"],
            "max_perturbation": r["max_differential_perturbation"],
            "safety_factor": r["safety_factor"],
            "at_risk_positions": r["at_risk_positions"],
            "guard_threshold": r["guard_threshold"],
            "guard_flagged_fraction": r["guard_flagged_fraction"],
            "guard_covers_measured_perturbation":
                r["guard_covers_measured_perturbation"],
        }
        print(f"  loss={out[variant]['train_loss_last']:.3f} "
              f"mismatches={out[variant]['serving_code_mismatches']}"
              f"/{out[variant]['total_codes']} "
              f"min_margin={out[variant]['min_margin']:.3e} "
              f"safety={out[variant]['safety_factor']:.2f}x "
              f"guard_flagged={out[variant]['guard_flagged_fraction']:.3%} "
              f"covered={out[variant]['guard_covers_measured_perturbation']}",
              flush=True)
    return out


def main(out_path: str = "PARITY_REPORT.json") -> dict:
    report = {
        "generator": "python -m tests.margin_audit",
        "method": __doc__.split("\n\n")[2],
        "network": network_evidence(),
        "codecs": [],
        "precision_high": [],
        "pallas_fused": None,
    }
    # precision sections are only meaningful on TPU: the CPU backend runs
    # f32 matmuls at full precision whatever the Precision enum says, so a
    # CPU 'high'/'fast' audit only measures the conv-lowering difference
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        report["precision_fast"] = []
    for name in ("encodec_24khz", "encodec_48khz"):
        print(f"auditing {name} ...", flush=True)
        report["codecs"].append(audit_codec(name))
        print(f"auditing {name} precision=high ...", flush=True)
        report["precision_high"].append(audit_precision(name, mode="high"))
        if on_tpu:
            # quantify the 'fast' mode's flip rate on the platform where
            # bf16 single-pass actually changes the numerics (the mode is
            # refused for .ecdc writing either way)
            print(f"auditing {name} precision=fast ...", flush=True)
            report["precision_fast"].append(
                audit_precision(name, mode="fast"))
    print("auditing pallas_fused ...", flush=True)
    report["pallas_fused"] = audit_pallas()
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_path}")
    for c in report["codecs"]:
        print(f"  {c['model']}: mismatches={c['total_code_mismatches']} "
              f"min_margin={c['min_margin']:.3e} "
              f"max_pert={c['max_differential_perturbation']:.3e} "
              f"at_risk={c['at_risk_positions']} "
              f"safety={c['safety_factor']:.1f}x")
    for c in report["precision_high"]:
        print(f"  {c['model']} high-vs-highest: "
              f"bw_mismatches={c['total_bandwidth_mismatches']} "
              f"full_depth_flips={c['full_depth_code_flips']} "
              f"max_pert={c['max_differential_perturbation']:.3e} "
              f"at_risk={c['at_risk_positions']} "
              f"safety={c['safety_factor']:.1f}x")
    p = report["pallas_fused"]
    print(f"  pallas_fused: flips={p['flips']}/{p['total_codes']} "
          f"(platform={p['platform']})")
    return report


if __name__ == "__main__":
    # default to CPU (fast, deterministic); pass --tpu to audit the real
    # chip's numerics (cold compiles can take minutes — run in background)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    path = args[0] if args else "PARITY_REPORT.json"
    if "--trained-sweep" in sys.argv or "--trained-variants" in sys.argv:
        try:
            with open(path) as fh:
                rp = json.load(fh)
        except FileNotFoundError:
            rp = {}
        if "--trained-sweep" in sys.argv:
            rp["trained_margin_vs_length"] = audit_trained_sweep()
            print(f"appended trained_margin_vs_length to {path}")
        if "--trained-variants" in sys.argv:
            rp["trained_margin_by_config"] = audit_trained_variants()
            print(f"appended trained_margin_by_config to {path}")
        with open(path, "w") as fh:
            json.dump(rp, fh, indent=1)
    else:
        main(path)
