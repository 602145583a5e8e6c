"""Residual vector quantization with explicit functional state.

Behavioral reference: encodec/quantization/core_vq.py (EuclideanCodebook
101-255, VectorQuantization 258-347, ResidualVectorQuantization 364-445) and
encodec/quantization/vq.py (bandwidth→n_q selection 116-131).

TPU-first design
----------------
* Codebooks for all stages are stacked into one `[n_q, bins, dim]` array and
  the stage loop is a `lax.scan`, so the whole RVQ is one compiled program.
* The nearest-neighbor search is the hot op: a `[N, D] x [D, bins]` matmul
  on the MXU plus an argmax. Distances follow the reference's exact
  association order `‖x‖² - 2·x·Eᵀ + ‖E‖²` with an argmax over the negated
  distance (ties → lowest index, matching torch `max().indices`), computed
  in f32, so code indices reproduce the reference bit-for-bit.
* EMA updates / k-means init / dead-code expiry are pure functions of
  `(state, rng, batch)`. Under a data-parallel `pjit` the batch statistics
  (`one_hot.sum(0)`, `xᵀ·onehot`) are global reductions, which makes every
  replica's state update identical — replacing the reference's
  `distrib.sync_buffer`/`broadcast_tensors` side channel.

Parity quirks deliberately preserved (SURVEY §7.5): residual update uses the
non-detached quantized value; commitment weight is forced to 1.0; dead-code
expiry keeps EMA-vs-threshold semantics. The fork's "one shared codebook for
all stages" (core_vq.py:374) is available via `RVQConfig.shared_codebook`;
independent per-stage codebooks (upstream checkpoints) are the default.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RVQConfig:
    dimension: int = 256
    n_q: int = 8
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    epsilon: float = 1e-5
    shared_codebook: bool = False  # fork quirk: one VQ reused for all stages

    @property
    def num_books(self) -> int:
        return 1 if self.shared_codebook else self.n_q


class RVQState(tp.NamedTuple):
    """EMA codebook state. Leading axis = codebook index (1 if shared)."""
    embed: Array        # [n_books, bins, dim]
    embed_avg: Array    # [n_books, bins, dim]
    cluster_size: Array  # [n_books, bins]
    inited: Array       # [] bool — k-means init already done?


def init_rvq(key, cfg: RVQConfig) -> RVQState:
    n = cfg.num_books
    if cfg.kmeans_init:
        embed = jnp.zeros((n, cfg.bins, cfg.dimension), jnp.float32)
        inited = jnp.asarray(False)
    else:
        # kaiming-uniform, like the reference's uniform_init
        bound = math.sqrt(3.0) * math.sqrt(2.0 / cfg.dimension)
        embed = jax.random.uniform(key, (n, cfg.bins, cfg.dimension),
                                   jnp.float32, -bound, bound)
        inited = jnp.asarray(True)
    return RVQState(
        embed=embed,
        embed_avg=embed.copy(),
        cluster_size=jnp.zeros((n, cfg.bins), jnp.float32),
        inited=inited,
    )


# ---------------------------------------------------------------------------
# Nearest-neighbor search
# ---------------------------------------------------------------------------

_NEAREST_IMPL = "xla"  # "xla" | "pallas" | "pallas_fused"


def set_nearest_impl(impl: str) -> None:
    """Select the RVQ search backend: "xla" (default, full-precision parity
    path), "pallas" (fused per-stage search kernel), or "pallas_fused" (one
    kernel for ALL stages with the residual VMEM-resident — no HBM
    round-trip between stages; kernels/vq_pallas.py). The Pallas backends
    match the XLA indices except on EXACT distance ties, where last-ulp
    cross-executable float differences can flip the winner (see
    rvq_encode_pallas's caveat) — keep "xla" for bitstream-reproducible
    encoding; the kernels are serving-latency opt-ins."""
    global _NEAREST_IMPL
    assert impl in ("xla", "pallas", "pallas_fused"), impl
    _NEAREST_IMPL = impl


def _nearest(x: Array, embed: Array, precision=jax.lax.Precision.HIGHEST) -> Array:
    """Indices of nearest codebook rows. x: [N, D], embed: [bins, D] → [N]."""
    if _NEAREST_IMPL == "pallas":
        from ..kernels import nearest_codebook_pallas
        return nearest_codebook_pallas(x, embed)
    embed_t = embed.T
    dist = -(
        jnp.sum(jnp.square(x), axis=1, keepdims=True)
        - 2.0 * jnp.dot(x, embed_t, precision=precision)
        + jnp.sum(jnp.square(embed_t), axis=0, keepdims=True)
    )
    return jnp.argmax(dist, axis=-1)


def _book(state_embed: Array, k, cfg: RVQConfig) -> Array:
    """Codebook for stage k (static or traced), honoring sharing."""
    if cfg.shared_codebook:
        return state_embed[0]
    return state_embed[k]


# ---------------------------------------------------------------------------
# Inference paths
# ---------------------------------------------------------------------------

def rvq_encode(state: RVQState, x: Array, cfg: RVQConfig,
               n_q: tp.Optional[int] = None,
               precision=jax.lax.Precision.HIGHEST) -> Array:
    """Encode `[B, T, D]` → codes `[K, B, T]` (reference layer-major layout)."""
    # the reference slices `layers[:n_q]`, silently capping at the available
    # stages when the bandwidth formula asks for more
    n_q = min(n_q or cfg.n_q, cfg.n_q)
    B, T, D = x.shape
    flat = x.reshape(B * T, D)

    if _NEAREST_IMPL == "pallas_fused":
        from ..kernels import rvq_encode_pallas
        codes = rvq_encode_pallas(flat, state.embed, n_q=n_q,
                                  shared=cfg.shared_codebook)
        return codes.reshape(n_q, B, T)

    if cfg.shared_codebook:
        embed = state.embed[0]

        def step(residual, _):
            idx = _nearest(residual, embed, precision)
            quantized = embed[idx]
            return residual - quantized, idx

        _, codes = jax.lax.scan(step, flat, None, length=n_q)
    else:
        def step(residual, embed_k):
            idx = _nearest(residual, embed_k, precision)
            quantized = embed_k[idx]
            return residual - quantized, idx

        _, codes = jax.lax.scan(step, flat, state.embed[:n_q])
    return codes.reshape(n_q, B, T)


def rvq_encode_margins(state: RVQState, x: Array, cfg: RVQConfig,
                       n_q: tp.Optional[int] = None,
                       precision=jax.lax.Precision.HIGHEST
                       ) -> tp.Tuple[Array, Array]:
    """`rvq_encode` + per-stage argmin margins, for the container-writing
    near-tie guard (stream/compress.py `tie_guard`).

    Returns (codes [K, B, T] — EXACTLY `rvq_encode`'s selection: same
    `_nearest` distance form, same argmax-first tie-break — and margins
    [K, B, T] f32 = best-other-distance minus chosen-distance, one extra
    masked-max reduction per stage). A position whose margin falls under
    the guard threshold is re-resolved on host in f64
    (`resolve_ties_f64`) so every writer — any precision mode, any
    platform — emits the same codes there."""
    n_q = min(n_q or cfg.n_q, cfg.n_q)
    B, T, D = x.shape
    flat = x.reshape(B * T, D)

    def stage(residual, embed):
        embed_t = embed.T
        dist = -(
            jnp.sum(jnp.square(residual), axis=1, keepdims=True)
            - 2.0 * jnp.dot(residual, embed_t, precision=precision)
            + jnp.sum(jnp.square(embed_t), axis=0, keepdims=True)
        )
        idx = jnp.argmax(dist, axis=-1)                 # == _nearest
        best = jnp.take_along_axis(dist, idx[:, None], axis=-1)[:, 0]
        masked = jnp.where(
            jax.nn.one_hot(idx, dist.shape[-1], dtype=bool), -jnp.inf, dist)
        second = jnp.max(masked, axis=-1)
        margin = best - second                          # >= 0 (neg-dist gap)
        return residual - embed[idx], (idx, margin)

    if cfg.shared_codebook:
        embed = state.embed[0]
        _, (codes, margins) = jax.lax.scan(
            lambda r, _: stage(r, embed), flat, None, length=n_q)
    else:
        _, (codes, margins) = jax.lax.scan(
            lambda r, e: stage(r, e), flat, state.embed[:n_q])
    return codes.reshape(n_q, B, T), margins.reshape(n_q, B, T)


def resolve_ties_f64(state: RVQState, z: "np.ndarray", cfg: RVQConfig,
                     n_q: int) -> "np.ndarray":
    """Host float64 RVQ chain for flagged near-tie positions: the
    canonical cross-writer resolution (VERDICT r3 #3). `z`: [N, D]
    latents (any float dtype; promoted to f64). Returns codes [N, K].

    Exact squared distances in f64 with numpy argmin (first-index on
    exact ties — the reference association order, ref
    core_vq.py:178-194). f64 noise (~1e-16) only matters for true
    margins below ~1e-15, where the first-index rule still makes the
    choice deterministic for bit-identical z.

    The resolution is RELATIVE TO `z`: two writers only agree where
    their encoders produced the same latents to within the f64 margin.
    Cross-precision-mode writers drift in z itself, which no threshold
    can repair (measured: probes/fast_writer.py)."""
    import numpy as np
    z = np.asarray(z, np.float64)
    out = np.empty((z.shape[0], n_q), np.int64)
    residual = z.copy()
    # ONE device->host fetch for every stage's codebook: per-stage
    # np.asarray(state.embed[k]) cost a full-codebook transfer per stage
    # per call (~0.5 s/call on full-size books through the dev tunnel)
    books = np.asarray(
        state.embed[:1] if cfg.shared_codebook else state.embed[:n_q],
        np.float64)
    for k in range(n_q):
        embed = books[0] if cfg.shared_codebook else books[k]
        d = ((residual[:, None, :] - embed[None]) ** 2).sum(-1)
        idx = np.argmin(d, axis=1)
        out[:, k] = idx
        residual -= embed[idx]
    return out


def rvq_decode(state: RVQState, codes: Array, cfg: RVQConfig) -> Array:
    """Decode codes `[K, B, T]` → quantized latents `[B, T, D]`."""
    n_q = codes.shape[0]
    if cfg.shared_codebook:
        quantized = state.embed[0][codes]          # [K, B, T, D]
    else:
        quantized = jax.vmap(lambda e, c: e[c])(state.embed[:n_q], codes)
    return jnp.sum(quantized, axis=0)


# ---------------------------------------------------------------------------
# Training path
# ---------------------------------------------------------------------------

def _kmeans(key, samples: Array, num_clusters: int, num_iters: int) -> tp.Tuple[Array, Array]:
    """Plain k-means (ref core_vq.py:76-98). samples: [N, D]."""
    n = samples.shape[0]
    perm = jax.random.permutation(key, n)
    means = samples[perm[:num_clusters]]  # assumes N >= clusters; else wraps
    if n < num_clusters:
        idx = jax.random.randint(key, (num_clusters,), 0, n)
        means = samples[idx]

    def body(_, carry):
        means, _ = carry
        idx = _nearest(samples, means)
        one_hot = jax.nn.one_hot(idx, num_clusters, dtype=samples.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = jnp.einsum("nc,nd->cd", one_hot, samples,
                          precision=jax.lax.Precision.HIGHEST)
        new_means = sums / jnp.maximum(counts, 1.0)[:, None]
        return (jnp.where((counts == 0)[:, None], means, new_means), counts)

    # like the reference, the returned counts are the LAST iteration's
    # assignment (against the means *before* their final update) — they
    # seed the cluster-size EMA, so the off-by-one-update matters for
    # which codes sit at the dead-code threshold (ref core_vq.py:88-98
    # returns `bins` from the loop body, not a post-loop recount)
    means, counts = jax.lax.fori_loop(
        0, num_iters, body,
        (means, jnp.zeros((num_clusters,), samples.dtype)))
    return means, counts


def _sample_vectors(key, samples: Array, num: int) -> Array:
    """Random batch vectors for init/expiry (ref core_vq.py:65-73)."""
    n = samples.shape[0]
    # static branch impossible under jit for n vs num comparison on traced
    # shapes — shapes are static in jax, so this is a python-level branch.
    if n >= num:
        idx = jax.random.permutation(key, n)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def _stage_train(cfg: RVQConfig, residual: Array, embed: Array,
                 embed_avg: Array, cluster_size: Array, key,
                 precision=jax.lax.Precision.HIGHEST):
    """One RVQ stage in training mode.

    residual: [N, D]. Returns (quantized_st [N,D], codes [N], commit_loss [],
    new (embed, embed_avg, cluster_size)).
    """
    x = residual
    idx = _nearest(x, embed, precision)
    one_hot = jax.nn.one_hot(idx, cfg.bins, dtype=x.dtype)
    quantized = embed[idx]

    # EMA codebook update (ref core_vq.py:240-252).
    cluster_size_new = cluster_size * cfg.decay + jnp.sum(one_hot, axis=0) * (1 - cfg.decay)
    embed_sum = jnp.einsum("nd,nc->cd", x, one_hot, precision=precision)
    embed_avg_new = embed_avg * cfg.decay + embed_sum * (1 - cfg.decay)
    smoothed = ((cluster_size_new + cfg.epsilon)
                / (jnp.sum(cluster_size_new) + cfg.bins * cfg.epsilon)
                * jnp.sum(cluster_size_new))
    embed_out = embed_avg_new / smoothed[:, None]

    # Dead-code expiry. Deliberate deviation from the reference: in
    # core_vq.py:240-252 the expiry write to `embed` is clobbered by the
    # EMA copy at the end of the same forward, making it inert. We apply
    # the intended behavior — replace under-used codes with random batch
    # vectors and keep the EMA average consistent so the replacement
    # survives the next normalization.
    if cfg.threshold_ema_dead_code > 0:
        expired = cluster_size_new < cfg.threshold_ema_dead_code
        replacement = _sample_vectors(key, x, cfg.bins)
        embed_out = jnp.where(expired[:, None], replacement, embed_out)
        embed_avg_new = jnp.where(expired[:, None],
                                  replacement * smoothed[:, None],
                                  embed_avg_new)

    # straight-through + commit loss (ref core_vq.py:316-346)
    quantized_st = x + jax.lax.stop_gradient(quantized - x)
    commit_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(quantized_st) - x))

    return quantized_st, idx, commit_loss, (embed_out, embed_avg_new, cluster_size_new)


def rvq_forward(state: RVQState, x: Array, cfg: RVQConfig, *,
                n_q: tp.Optional[int] = None, training: bool = True,
                rng: tp.Optional[Array] = None,
                precision=jax.lax.Precision.HIGHEST):
    """Full RVQ forward (training semantics of the reference's `vq(x, n_q)`).

    Args:
        x: [B, T, D] latents.
    Returns:
        (quantized [B,T,D], codes [K,B,T], commit_losses [K], new_state)
    """
    n_q = min(n_q or cfg.n_q, cfg.n_q)
    B, T, D = x.shape
    flat = x.reshape(B * T, D)

    if not training:
        codes = rvq_encode(state, x, cfg, n_q=n_q, precision=precision)
        quantized = rvq_decode(state, codes, cfg)
        commit = jnp.zeros((n_q,), x.dtype)
        return quantized, codes, commit, state

    if rng is None:
        rng = jax.random.PRNGKey(0)
    init_key, rng = jax.random.split(rng)

    # Lazy k-means init on the first training batch (ref core_vq.py:142-153).
    # Each layer inits lazily when the forward first reaches it, i.e. stage
    # k's k-means sees the RESIDUAL after stages <k quantize with their
    # fresh codebooks — NOT the raw latents (stage-k residuals are an order
    # of magnitude smaller than x, so raw-x centroids would leave every
    # later stage near-useless until dead-code expiry rescues it). The
    # init-time quantization uses the post-kmeans, pre-EMA means, exactly
    # what the training pass below will use for its own residual chain.
    if cfg.kmeans_init:
        def do_init(_):
            def body(residual, key):
                means, counts = _kmeans(key, residual, cfg.bins,
                                        cfg.kmeans_iters)
                idx = _nearest(residual, means, precision)
                return residual - means[idx], (means, counts)

            keys = jax.random.split(init_key, cfg.num_books)
            _, (means, counts) = jax.lax.scan(
                body, jax.lax.stop_gradient(flat), keys)
            return RVQState(means, means, counts, jnp.asarray(True))

        state = jax.lax.cond(state.inited, lambda s: s,
                             lambda s: do_init(None), state)

    keys = jax.random.split(rng, n_q)

    if cfg.shared_codebook:
        def step(carry, key_k):
            residual, embed, embed_avg, csize = carry
            q, idx, commit, (embed, embed_avg, csize) = _stage_train(
                cfg, residual, embed, embed_avg, csize, key_k, precision)
            return (residual - q, embed, embed_avg, csize), (q, idx, commit)

        carry = (flat, state.embed[0], state.embed_avg[0], state.cluster_size[0])
        (_, embed, embed_avg, csize), (qs, codes, commits) = jax.lax.scan(
            step, carry, keys)
        new_state = RVQState(embed[None], embed_avg[None], csize[None],
                             state.inited)
    else:
        def step(residual, book):
            embed, embed_avg, csize, key_k = book
            q, idx, commit, (embed, embed_avg, csize) = _stage_train(
                cfg, residual, embed, embed_avg, csize, key_k, precision)
            return residual - q, (q, idx, commit, embed, embed_avg, csize)

        books = (state.embed[:n_q], state.embed_avg[:n_q],
                 state.cluster_size[:n_q], keys)
        _, (qs, codes, commits, new_e, new_ea, new_cs) = jax.lax.scan(
            step, flat, books)
        # stages beyond n_q keep their previous state
        new_state = RVQState(
            state.embed.at[:n_q].set(new_e),
            state.embed_avg.at[:n_q].set(new_ea),
            state.cluster_size.at[:n_q].set(new_cs),
            state.inited,
        )

    quantized = jnp.sum(qs, axis=0).reshape(B, T, D)
    return quantized, codes.reshape(n_q, B, T), commits, new_state


def rvq_intermediate_results(state: RVQState, x: Array, cfg: RVQConfig,
                             n_q: tp.Optional[int] = None,
                             precision=jax.lax.Precision.HIGHEST) -> tp.Dict[str, Array]:
    """Per-stage quantized outputs alongside the sum (ref vq.py:80-89).

    Returns {'quantized' [B,T,D], 'codes' [K,B,T],
    'quantized_stack' [K,B,T,D]} — the hierarchy probe used by the fork's
    visualization tools.
    """
    n_q = min(n_q or cfg.n_q, cfg.n_q)
    codes = rvq_encode(state, x, cfg, n_q=n_q, precision=precision)
    if cfg.shared_codebook:
        stack = state.embed[0][codes]
    else:
        stack = jax.vmap(lambda e, c: e[c])(state.embed[:n_q], codes)
    return {
        "quantized": jnp.sum(stack, axis=0),
        "codes": codes,
        "quantized_stack": stack,
    }


# ---------------------------------------------------------------------------
# Bandwidth bookkeeping (ref vq.py:116-131)
# ---------------------------------------------------------------------------

def bandwidth_per_quantizer(bins: int, frame_rate: float) -> float:
    """kbps·1000 contributed by one codebook at the given frame rate."""
    return math.log2(bins) * frame_rate


def num_quantizers_for_bandwidth(cfg: RVQConfig, frame_rate: float,
                                 bandwidth: tp.Optional[float]) -> int:
    bw_per_q = bandwidth_per_quantizer(cfg.bins, frame_rate)
    n_q = cfg.n_q
    if bandwidth and bandwidth > 0.0:
        n_q = int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))
    return n_q
