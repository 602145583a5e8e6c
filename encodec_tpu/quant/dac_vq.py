"""DAC-style residual vector quantizer (gradient-trained codebooks).

Behavioral reference: encodec/quantization/dac_vq.py — the alternative RVQ
the fork keeps alongside the EMA quantizer (not wired into the model by
default, same here): factorized codes via weight-normed 1x1 projections
(Improved-VQGAN), L2-normalized cosine lookup, per-stage commitment/codebook
MSE losses, quantizer dropout during training, and `from_codes` /
`from_latents` reconstruction. Also `snake`, the periodic activation from
the DAC codebase (encodec/quantization/dac.py:17-32).

JAX layout: activations `[B, T, D]` (channels-last); the 1x1 convs are plain
matmuls on the MXU. Losses are per-batch-item `[B]` like the reference.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def snake(x: Array, alpha: float = 1.0) -> Array:
    """snake(x) = x + sin^2(alpha*x)/alpha (ref dac.py:17-24)."""
    return x + jnp.square(jnp.sin(alpha * x)) / (alpha + 1e-9)


@dataclasses.dataclass(frozen=True)
class DacRVQConfig:
    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: tp.Union[int, tp.Tuple[int, ...]] = 8
    quantizer_dropout: float = 0.0

    def dims(self) -> tp.Tuple[int, ...]:
        d = self.codebook_dim
        return tuple(d for _ in range(self.n_codebooks)) \
            if isinstance(d, int) else tuple(d)


def _init_wn_linear(key, fan_in: int, fan_out: int) -> dict:
    """Weight-normed 1x1 conv == linear with (v [in,out], g [out], b)."""
    import math
    k1, k2 = jax.random.split(key)
    bound = math.sqrt(2.0 / 6.0) * math.sqrt(3.0 / fan_in)
    v = jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound)
    g = jnp.sqrt(jnp.sum(v * v, axis=0))
    b = jax.random.uniform(k2, (fan_out,), jnp.float32,
                           -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in))
    return {"v": v, "g": g, "b": b}


def _wn_linear(p: dict, x: Array, precision=None) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(p["v"]), axis=0, keepdims=True))
    w = p["g"] * p["v"] / norm
    return jnp.dot(x, w, precision=precision) + p["b"]


def init_dac_rvq(key, cfg: DacRVQConfig) -> dict:
    stages = []
    for dim in cfg.dims():
        key, k1, k2, k3 = jax.random.split(key, 4)
        stages.append({
            "in_proj": _init_wn_linear(k1, cfg.input_dim, dim),
            "out_proj": _init_wn_linear(k2, dim, cfg.input_dim),
            # torch nn.Embedding default init: N(0, 1)
            "codebook": jax.random.normal(k3, (cfg.codebook_size, dim)),
        })
    return {"stages": stages}


def _decode_latents(codebook: Array, z_e: Array, precision=None):
    """Cosine nearest-neighbor lookup. z_e: [B, T, d] → (z_q, indices)."""
    B, T, d = z_e.shape
    enc = z_e.reshape(B * T, d)
    enc_n = enc / jnp.maximum(jnp.linalg.norm(enc, axis=1, keepdims=True), 1e-12)
    cb_n = codebook / jnp.maximum(
        jnp.linalg.norm(codebook, axis=1, keepdims=True), 1e-12)
    dist = (jnp.sum(jnp.square(enc_n), axis=1, keepdims=True)
            - 2 * jnp.dot(enc_n, cb_n.T, precision=precision)
            + jnp.sum(jnp.square(cb_n), axis=1)[None, :])
    indices = jnp.argmax(-dist, axis=1).reshape(B, T)
    z_q = codebook[indices]
    return z_q, indices


def dac_vq_stage(stage: dict, residual: Array, training: bool,
                 precision=None):
    """One VectorQuantize stage (ref dac_vq.py:52-93).

    Returns (z_q [B,T,D], commit [B], codebook [B], indices [B,T],
    z_e [B,T,d])."""
    z_e = _wn_linear(stage["in_proj"], residual, precision)
    z_q, indices = _decode_latents(stage["codebook"], z_e, precision)
    if training:
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
    commit = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)),
                      axis=(1, 2))
    codebook = jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_e)),
                        axis=(1, 2))
    z_q_out = _wn_linear(stage["out_proj"], z_q, precision)
    return z_q_out, commit, codebook, indices, z_e


def dac_rvq_forward(params: dict, z: Array, cfg: DacRVQConfig, *,
                    n_quantizers: tp.Optional[int] = None,
                    training: bool = False,
                    rng: tp.Optional[Array] = None, precision=None) -> dict:
    """Full RVQ (ref dac_vq.py:149-231). z: [B, T, D].

    Training with `quantizer_dropout`: the first `floor(B*dropout)` batch
    items get a random number of active quantizers in [1, n_codebooks].
    Returns dict with z [B,T,D], codes [B,N,T], latents [B,T,sum(d)],
    commitment_loss [B,N], codebook_loss [B,N].
    """
    B, T, D = z.shape
    N = cfg.n_codebooks
    if n_quantizers is None:
        n_quantizers = N
    if training:
        nq_vec = jnp.full((B,), N + 1, jnp.float32)
        if cfg.quantizer_dropout > 0:
            assert rng is not None
            dropout = jax.random.randint(rng, (B,), 1, N + 1).astype(jnp.float32)
            n_dropout = int(B * cfg.quantizer_dropout)
            nq_vec = nq_vec.at[:n_dropout].set(dropout[:n_dropout])
        stages_to_run = N
    else:
        nq_vec = jnp.full((B,), n_quantizers, jnp.float32)
        stages_to_run = min(n_quantizers, N)

    z_q = jnp.zeros_like(z)
    residual = z
    codes, latents, commits, codebooks = [], [], [], []
    for i in range(stages_to_run):
        z_q_i, commit_i, codebook_i, indices_i, z_e_i = dac_vq_stage(
            params["stages"][i], residual, training, precision)
        mask = (i < nq_vec).astype(z.dtype)[:, None, None]
        z_q = z_q + z_q_i * mask
        residual = residual - z_q_i
        codes.append(indices_i)
        latents.append(z_e_i)
        commits.append(commit_i)
        codebooks.append(codebook_i)

    return {
        "z": z_q,
        "codes": jnp.stack(codes, axis=1),              # [B, N, T]
        "latents": jnp.concatenate(latents, axis=-1),   # [B, T, sum(d)]
        "commitment_loss": jnp.stack(commits, axis=1),  # [B, N]
        "codebook_loss": jnp.stack(codebooks, axis=1),  # [B, N]
    }


def dac_from_codes(params: dict, codes: Array, precision=None):
    """codes [B, N, T] → (z_q [B,T,D], z_p [B,T,sum(d)], codes)."""
    n_codebooks = codes.shape[1]
    z_q = 0.0
    z_p = []
    for i in range(n_codebooks):
        stage = params["stages"][i]
        z_p_i = stage["codebook"][codes[:, i]]
        z_p.append(z_p_i)
        z_q = z_q + _wn_linear(stage["out_proj"], z_p_i, precision)
    return z_q, jnp.concatenate(z_p, axis=-1), codes


def dac_from_latents(params: dict, latents: Array, cfg: DacRVQConfig,
                     precision=None):
    """latents [B, T, sum(d_i)] → (z_q, z_p, codes) (ref dac_vq.py:257-290)."""
    import numpy as np
    dims = np.cumsum([0] + list(cfg.dims()))
    n_codebooks = int(np.where(dims <= latents.shape[-1])[0].max())
    z_q = 0.0
    z_p, codes = [], []
    for i in range(n_codebooks):
        j, k = int(dims[i]), int(dims[i + 1])
        stage = params["stages"][i]
        z_p_i, codes_i = _decode_latents(stage["codebook"],
                                         latents[:, :, j:k], precision)
        z_p.append(z_p_i)
        codes.append(codes_i)
        z_q = z_q + _wn_linear(stage["out_proj"], z_p_i, precision)
    return z_q, jnp.concatenate(z_p, axis=-1), jnp.stack(codes, axis=1)
