"""Multi-codebook language model over RVQ indices (entropy-coding prior).

Behavioral reference: encodec/model.py:45-83 (LMModel) and
encodec/modules/transformer.py (StreamingTransformerEncoder): summed
per-codebook embeddings → 5-layer causal transformer with a bounded
`past_context` attention window and sinusoidal positions offset by the
stream position → per-codebook linear heads → softmax over the cardinality.

TPU-first split:
* `lm_forward_batch` evaluates the *whole* teacher-forced sequence in one
  jitted call (one big masked attention) — this is the compression path,
  where all codes are known up front. The reference loops per timestep on
  CPU (compress.py:72-78, its documented "5x slower"); we batch it.
* `lm_step` is the streaming single-step path for decompression, where code
  t depends on decoded code t-1. The reference grows a python list KV cache
  (transformer.py:117-118); here it is a fixed-size ring buffer + length
  counter so the step compiles once and never reshapes.

Parity quirk preserved: the reference initializes the per-layer cache with
one all-zero timestep (transformer.py:106) which *is attended to* until it
falls out of the window — the zero entry is reproduced in both paths.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LMConfig:
    n_q: int = 32
    card: int = 1024
    dim: int = 200
    num_heads: int = 8
    num_layers: int = 5
    hidden_scale: float = 4.0
    max_period: float = 10000.0
    past_context: int = 1000


def init_lm(key, cfg: LMConfig) -> dict:
    """Random-init LM parameters (torch Linear/Embedding default inits)."""
    import math
    d, h = cfg.dim, int(cfg.dim * cfg.hidden_scale)

    def lin(key, fan_in, fan_out):
        k1, k2 = jax.random.split(key)
        # torch Linear default: kaiming_uniform_(a=sqrt(5)) == U(+/-b)
        # with b = sqrt(3)*std = sqrt(3)*sqrt(1/3)/sqrt(fan_in)
        #        = 1/sqrt(fan_in) — the sqrt(3) is already inside b
        bound = 1.0 / math.sqrt(fan_in)
        return {"w": jax.random.uniform(k1, (fan_in, fan_out), jnp.float32,
                                        -bound, bound),
                "b": jax.random.uniform(k2, (fan_out,), jnp.float32,
                                        -bound, bound)}

    keys = jax.random.split(key, 8 + cfg.num_layers)
    p: dict = {
        "emb": jax.random.normal(keys[0], (cfg.n_q, cfg.card + 1, d)),
        "linears": {
            "w": jax.random.normal(keys[1], (cfg.n_q, d, cfg.card)) / math.sqrt(d),
            "b": jnp.zeros((cfg.n_q, cfg.card)),
        },
        "norm_in": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[8 + i], 6)
        p["layers"].append({
            "q": lin(lk[0], d, d), "k": lin(lk[1], d, d), "v": lin(lk[2], d, d),
            "out": lin(lk[3], d, d),
            "ff1": lin(lk[4], d, h), "ff2": lin(lk[5], h, d),
            "norm1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "norm2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        })
    return p


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(x, p, precision=None):
    return jnp.dot(x, p["w"], precision=precision) + p["b"]


def sin_embedding(positions: Array, dim: int, max_period: float = 10000.0) -> Array:
    """positions `[*,]`-shaped → `[*, dim]` (cos half then sin half).
    Ref transformer.py:16-27."""
    half = dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)
    phase = positions[..., None] / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _attention(layer, q_in: Array, kv_in: Array, mask: Array,
               num_heads: int, precision=None) -> Array:
    """Masked multi-head attention. q_in [B,T,C], kv_in [B,S,C],
    mask [T,S] or [B,T,S] (True = attend)."""
    B, T, C = q_in.shape
    S = kv_in.shape[1]
    H = num_heads
    hd = C // H
    q = _linear(q_in, layer["q"], precision).reshape(B, T, H, hd)
    k = _linear(kv_in, layer["k"], precision).reshape(B, S, H, hd)
    v = _linear(kv_in, layer["v"], precision).reshape(B, S, H, hd)
    logits = jnp.einsum("bthd,bshd->bhts", q, k, precision=precision)
    logits = logits / jnp.sqrt(jnp.asarray(hd, logits.dtype))
    if mask.ndim == 2:
        mask = mask[None, None]
    else:
        mask = mask[:, None]
    logits = jnp.where(mask, logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v, precision=precision)
    return _linear(out.reshape(B, T, C), layer["out"], precision)


def _transformer_layer(layer, x: Array, x_past: Array, mask: Array,
                       num_heads: int, precision=None) -> tp.Tuple[Array, Array]:
    """Post-norm transformer layer (torch norm_first=False).
    Returns (output, sa_input) — sa_input feeds the next step's KV cache."""
    sa_input = x
    kv = jnp.concatenate([x_past, x], axis=1)
    x = _layer_norm(x + _attention(layer, x, kv, mask, num_heads, precision),
                    layer["norm1"])
    ff = _linear(jax.nn.gelu(_linear(x, layer["ff1"], precision),
                             approximate=False), layer["ff2"], precision)
    x = _layer_norm(x + ff, layer["norm2"])
    return x, sa_input


# ---------------------------------------------------------------------------
# Batched (teacher-forced) evaluation — the compression path
# ---------------------------------------------------------------------------

def lm_prologue(params: dict, indices: Array, cfg: LMConfig,
                offset: int = 0) -> tp.Tuple[Array, Array]:
    """Shared trunk input: summed embeddings + input norm + sinusoid
    positions, and the `[T, T+1]` attention mask (keys = [zero-init entry]
    + sequence; query t attends keys with 0 <= (t+1) - kpos <=
    past_context, ref transformer.py:52-57 with H=1). One definition for
    the offline AND pipelined paths — the entropy codec is bit-sensitive,
    so a drift between them would only surface as corrupt streams."""
    B, K, T = indices.shape
    x = jnp.sum(jax.vmap(lambda e, idx: e[idx], in_axes=(0, 1), out_axes=1)(
        params["emb"][:K], indices), axis=1)          # [B, T, C]
    positions = jnp.arange(T, dtype=jnp.float32) + offset
    pos_emb = sin_embedding(positions, cfg.dim, cfg.max_period)
    x = _layer_norm(x, params["norm_in"]) + pos_emb[None]

    qpos = jnp.arange(1, T + 1)[:, None]
    kpos = jnp.arange(0, T + 1)[None, :]
    delta = qpos - kpos
    mask = (delta >= 0) & (delta <= cfg.past_context)
    return x, mask


def lm_head(params: dict, x: Array, K: int, precision=None,
            return_logits: bool = False) -> Array:
    """Shared per-codebook output head: `[B, T, C]` trunk output →
    `[B, card, K, T]` logits/probabilities."""
    logits = jnp.einsum("btc,kcn->bnkt", x, params["linears"]["w"][:K],
                        precision=precision) \
        + params["linears"]["b"][:K].T[None, :, :, None]
    if return_logits:
        return logits
    return jax.nn.softmax(logits, axis=1)


def lm_forward_batch(params: dict, indices: Array, cfg: LMConfig,
                     offset: int = 0, precision=None,
                     return_logits: bool = False) -> Array:
    """Evaluate the LM on a whole `[B, K, T]` index sequence at once.

    `indices[t]` must be 1 + code at step t-1 (0 at t=0) — the caller shifts.
    Returns probabilities `[B, card, K, T]` (or logits with
    `return_logits`), matching a from-scratch streaming evaluation of the
    reference (including its initial zero cache entry).
    """
    B, K, T = indices.shape
    x, mask = lm_prologue(params, indices, cfg, offset)
    zero = jnp.zeros((B, 1, cfg.dim), x.dtype)
    for layer in params["layers"]:
        x, _ = _transformer_layer(layer, x, zero, mask, cfg.num_heads,
                                  precision)
    return lm_head(params, x, K, precision, return_logits)


# ---------------------------------------------------------------------------
# Streaming single-step evaluation — the decompression path
# ---------------------------------------------------------------------------

class LMStreamState(tp.NamedTuple):
    cache: Array   # [num_layers, B, W, C] per-layer KV inputs, newest last
    length: Array  # [] int32 — number of valid entries (<= W)
    offset: Array  # [] int32 — absolute stream position


def init_lm_stream(cfg: LMConfig, batch: int = 1) -> LMStreamState:
    W = cfg.past_context
    cache = jnp.zeros((cfg.num_layers, batch, W, cfg.dim), jnp.float32)
    # the reference's initial zero state counts as one valid (zero) entry
    return LMStreamState(cache=cache, length=jnp.asarray(1, jnp.int32),
                         offset=jnp.asarray(0, jnp.int32))


def lm_step(params: dict, indices: Array, state: LMStreamState,
            cfg: LMConfig, precision=None) -> tp.Tuple[Array, LMStreamState]:
    """One streaming step. indices: `[B, K]` (1 + previous codes, 0 first).

    Returns (probas `[B, card, K]`, new state). Jit-stable: the cache is a
    fixed `[L, B, W, C]` ring (left-shift insert), `length` masks validity.
    """
    B, K = indices.shape
    W = cfg.past_context
    x = jnp.sum(jax.vmap(lambda e, idx: e[idx], in_axes=(0, 1), out_axes=1)(
        params["emb"][:K], indices), axis=1)          # [B, C]
    pos_emb = sin_embedding(state.offset.astype(jnp.float32)[None], cfg.dim,
                            cfg.max_period)[0]
    x = _layer_norm(x, params["norm_in"]) + pos_emb
    x = x[:, None]                                     # [B, 1, C]

    # valid cache entries are the newest `min(length, W)`; they all sit
    # within the past_context window by construction (W == past_context).
    n_valid = jnp.minimum(state.length, W)
    slot = jnp.arange(W)
    key_valid = slot >= (W - n_valid)                  # [W]
    mask = jnp.concatenate([key_valid, jnp.ones((1,), bool)])[None, :]  # [1, W+1]

    new_cache = []
    for li, layer in enumerate(params["layers"]):
        past = state.cache[li]                         # [B, W, C]
        x_new, sa_input = _transformer_layer(layer, x, past, mask,
                                             cfg.num_heads, precision)
        shifted = jnp.concatenate([past[:, 1:], sa_input], axis=1)
        new_cache.append(shifted)
        x = x_new

    logits = jnp.einsum("bc,kcn->bnk", x[:, 0], params["linears"]["w"][:K],
                        precision=precision) + params["linears"]["b"][:K].T[None]
    probas = jax.nn.softmax(logits, axis=1)
    new_state = LMStreamState(cache=jnp.stack(new_cache),
                              length=jnp.minimum(state.length + 1, W + 1),
                              offset=state.offset + 1)
    return probas, new_state


def lm_scan_chunk(params: dict, indices: Array, state: LMStreamState,
                  cfg: LMConfig, precision=None
                  ) -> tp.Tuple[Array, LMStreamState]:
    """Scan the streaming cell over a fixed-size chunk of shifted indices.

    `indices`: `[B, K, C]` (1 + code at t-1; 0 at the very first step).
    Returns `(probas [B, card, K, C], state_out)`.

    This is THE pinned executable of the LM entropy codec: `.ecdc`
    compression runs it over fully-known (teacher-forced) chunks — one
    device dispatch per C tokens instead of one tunnel round-trip per token
    (ref compress.py:72-78 loops per timestep on CPU) — and decompression
    re-runs the *same* compiled function over the decoded prefix of the
    current chunk (zeros beyond). Causality of the scan carry makes
    `probas[..., t]` depend only on `state` and `indices[..., :t+1]`, so the
    decoder reproduces the encoder's float32 probabilities BIT-EXACTLY —
    which guarantees identical quantized CDF rows, the condition the range
    coder actually requires (`stream.device_cdf`).

    Why not mix this with per-token `lm_step` across the interchange? The
    identical float32 math compiled as a standalone step vs. inside a scan
    body measurably differs (~1e-7, above the CDF roundoff): XLA's codegen
    is deterministic per executable, not across executables. The codec
    therefore pins ONE executable for both directions; `lm_step` remains
    the low-latency streaming API.

    The same constraint rules out a fully on-device range DECODER (an
    int64 coder fused into the LM scan): such a program would inline the
    transformer body into a *different* executable than the encoder's, so
    its float32 probabilities — and hence its CDFs — would not be
    reproducible.

    Decode exploits a REFINEMENT of the rule, measured on both CPU and
    TPU backends: `lax.scan` executables with the same body but different
    trip counts ≥ 2 ARE mutually bit-exact (the body compiles to its own
    while-loop computation; only trip-count-1 scans get unrolled into the
    surrounding graph and diverge). The refinement is a fast-path
    assumption, never trusted: one tunnel-backend restart (2026-08-18)
    produced ulp-level cross-trip-count drift that later vanished. The
    fast decoder therefore advances with a pinned TWO-step executable
    (~2 cells/token instead of re-running this chunk executable per
    token), gated per chunk by a CDF-ROW-checksum self-check against ONE
    re-run of this executable (`bits_checksum` — rows, not probability
    bits, are what byte-correct decoding needs, so sub-quantization drift
    does not demote) — any platform where the rows diverge is detected
    before output escapes and decode falls back to same-executable
    re-runs (stream/compress.py `_decode_frame_lm_fast`). The lockstep
    multi-stream paths (`codec_symbol_bounds_batched` + the "fl"/"lmb"
    container indexes) amortize the per-token range-coder host round-trip
    across segments/blocks on top.
    """
    def body(st, idx_t):
        probas, st = lm_step(params, idx_t, st, cfg, precision)
        return st, probas

    idx_seq = jnp.moveaxis(indices, -1, 0)             # [C, B, K]
    state, probas = jax.lax.scan(body, state, idx_seq)  # [C, B, card, K]
    return jnp.moveaxis(probas, 0, -1), state          # [B, card, K, C]


def lm_scan(params: dict, indices: Array, cfg: LMConfig,
            precision=None) -> Array:
    """Teacher-forced sweep of the streaming cell over a whole `[B, K, T]`
    shifted index sequence (one `lax.scan`), from a fresh stream state.
    Returns probabilities `[B, card, K, T]`. Batched likelihood/eval path;
    the `.ecdc` codec uses the chunked variant above."""
    B, K, T = indices.shape
    probas, _ = lm_scan_chunk(params, indices, init_lm_stream(cfg, batch=B),
                              cfg, precision)
    return probas


# ---------------------------------------------------------------------------
# Model wrapper (reference get_lm_model parity)
# ---------------------------------------------------------------------------

def bits_checksum(x: Array) -> Array:
    """Order-sensitive int32 checksum of a tensor's exact 32-bit words.

    The fast LM decoder's self-check applies this to the QUANTIZED CDF
    ROWS (int32, `stream.device_cdf.quantized_cdf_rows`) each decode tier
    actually feeds its range decoder, and compares per token against
    checksums of the rows derived from ONE teacher-forced re-run of the
    encoder's big chunk executable. Row equality is exactly the condition
    byte-correct range decoding needs — the encoder's per-symbol bounds
    are slices of the same rows (`stream.device_cdf.symbol_bounds`) and
    the CDF builder itself is executable-independent (exactly-rounded ops
    only). Earlier rounds gated on bitwise *probability* equality, which
    is sufficient but not necessary — and proved fragile across tunnel
    backend restarts (2026-08-18: every fast tier demoted on ulp-level
    drift that left all rows unchanged). Gating on rows keeps the fast
    tiers live under sub-quantization drift while still demoting on any
    drift that could alter the byte stream. Odd weights make any
    single-element difference detectable (a nonzero delta times an odd
    weight is never 0 mod 2^32)."""
    flat = x.reshape(-1)
    bits = (flat if flat.dtype == jnp.int32
            else jax.lax.bitcast_convert_type(flat, jnp.int32))
    w = 2 * jnp.arange(bits.shape[0], dtype=jnp.int32) + 1
    return jnp.sum(bits * w)


class LMModel:
    """Convenience wrapper bundling params + config + jitted paths."""

    def __init__(self, cfg: LMConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._batch_jit: dict = {}
        self._step_jit = None

    @property
    def card(self) -> int:
        return self.cfg.card

    @property
    def n_q(self) -> int:
        return self.cfg.n_q

    def forward_batch(self, indices: Array) -> Array:
        key = ("batch",) + indices.shape
        if key not in self._batch_jit:
            cfg = self.cfg
            self._batch_jit[key] = jax.jit(
                lambda p, i: lm_forward_batch(p, i, cfg))
        return self._batch_jit[key](self.params, indices)

    def scan(self, indices: Array) -> Array:
        """Teacher-forced `[B, K, T]` sweep of the streaming cell on device
        from a fresh state (see `lm_scan`)."""
        key = ("scan",) + indices.shape
        if key not in self._batch_jit:
            cfg = self.cfg
            self._batch_jit[key] = jax.jit(
                lambda p, i: lm_scan(p, i, cfg))
        return self._batch_jit[key](self.params, indices)

    # -- pinned-chunk entropy-codec path (see lm_scan_chunk docstring) ------

    CODEC_CHUNK = 256

    def chunk_exec(self, batch: int, K: int, chunk: int):
        """The pinned `(params, indices [B,K,C], state) -> (probas, state)`
        executable shared by .ecdc encode and decode."""
        key = ("chunk", batch, K, chunk)
        if key not in self._batch_jit:
            cfg = self.cfg
            self._batch_jit[key] = jax.jit(
                lambda p, i, s: lm_scan_chunk(p, i, s, cfg))
        return self._batch_jit[key]

    def chunk_slicer(self):
        """Bit-preserving `[B,card,K,C], t -> [card,K]` output slice (a
        separate tiny executable that only *reads* the pinned executable's
        output, so it cannot perturb the floats)."""
        if "slicer" not in self._batch_jit:
            self._batch_jit["slicer"] = jax.jit(
                lambda pr, t: jax.lax.dynamic_index_in_dim(
                    pr[0], t, axis=2, keepdims=False))
        return self._batch_jit["slicer"]

    # (the unbatched cdf_row_exec/chunk_checksum_exec executables were
    # removed: every decode tier — single-frame included — now runs the
    # batched lockstep core, whose S=1 flatten is bit-identical to the
    # old unbatched forms. See batch_cdf_row_exec/batch_chunk_checksum_exec.)

    def fused_decode_chunk_exec(self):
        """Single-dispatch LM+range decode of one `CODEC_CHUNK` of tokens.

        The body of one scan step is: streaming LM cell (`lm_step`) →
        device CDF rows (`stream.device_cdf`) → K on-device range-decoder
        pulls (`stream.device_ac`), with the decoded row fed back through
        the carry — so an entire chunk decodes in ONE dispatch instead of
        ~1.5 host round-trips per token, and consecutive chunk dispatches
        chain their carries device-to-device with no host sync.

        Exactness: the CDF/AC ops are integer/exactly-rounded and thus
        executable-independent, but the LM cell here compiles inside a
        DIFFERENT executable than the encoder's pinned `lm_scan_chunk`
        (see that docstring: float32 codegen is deterministic per
        executable, not across them), so its probabilities are NOT
        guaranteed to bit-match the encoder's. The caller therefore
        verifies per-position checksums of the QUANTIZED CDF ROWS this
        scan actually decoded with (`bits_checksum(rows)`) against rows
        derived from one teacher-forced re-run of the canonical chunk
        executable over the *decoded* codes, and falls back to the
        pair-executable path on any mismatch
        (`stream.compress._decode_frame_lm_device`) — the same
        trust-nothing protocol the pair decoder uses. Row equality is the
        exact condition byte-correct decoding needs (the encoder's bounds
        are slices of the same rows), so ulp-level cell drift that leaves
        every row unchanged no longer demotes this tier. An
        `optimization_barrier` between the cell and the codec ops keeps
        XLA from fusing across the boundary, which empirically preserves
        bit-equality of the cell (verified per decode, never assumed).

        Batched (lockstep) signature, shared by the single-frame (S=1) and
        multi-segment paths: `(params, state, ac_state, data u8[S,N],
        nbits [S], prev_row [S,K] int32, ts [S] int32, t0 scalar) ->
        (syms [C,S,K], checksums [C], bad [C], ok [C], eof [C], state,
        ac_state, prev_row)`. `prev_row` holds the 1+code shifted previous
        tokens (zeros at stream start); `ts` the per-stream token counts:
        a lane is active at absolute position t iff `t < ts[lane]` —
        inactive lanes feed 0 to the LM and leave their range-decoder
        state untouched, exactly the host lockstep schedule
        (`stream.compress._lockstep_decode_fast`). Checksums cover the
        full `[S, K, card]` quantized CDF rows per position (layout of
        `batch_chunk_checksum_exec`). `bad` is per position over all
        lanes (host `_lockstep_pull` semantics); `ok`/`eof` cover active
        lanes only.
        """
        if "fused_decode" not in self._batch_jit:
            from ..stream import device_ac
            from ..stream.device_cdf import quantized_cdf_rows
            cfg = self.cfg
            chunk = self.CODEC_CHUNK

            def run_chunk(params, state, ac_state, data, nbits, prev_row,
                          ts, t0):
                pull = jax.vmap(device_ac.ac_pull_row,
                                in_axes=(0, 0, 0, 0))

                def body(carry, t_abs):
                    st, ac, prev = carry
                    probas, st = lm_step(params, prev, st, cfg)
                    probas = jax.lax.optimization_barrier(probas)
                    rows, bad = quantized_cdf_rows(
                        jnp.transpose(probas, (0, 2, 1)))   # [S, K, card]
                    cs = bits_checksum(rows)
                    ac_new, syms, ok, eof = pull(ac, rows, data, nbits)
                    active = t_abs < ts                     # [S]
                    ac = jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        ac_new, ac)
                    syms = jnp.where(active[:, None], syms, 0)
                    # the input at position t+1 is 1+codes[t] only while
                    # t+1 < ts; the encoder zero-pads from position ts on
                    # (codec_symbol_bounds_batched: shifted[:, 1:Ts] only)
                    feed = (t_abs + 1) < ts                 # [S]
                    nxt = jnp.where(feed[:, None],
                                    (1 + syms).astype(jnp.int32), 0)
                    ok = jnp.all(ok | ~active)
                    eof = jnp.any(eof & active)
                    return (st, ac, nxt), (syms, cs, bad, ok, eof)

                (state, ac_state, prev_row), outs = jax.lax.scan(
                    body, (state, ac_state, prev_row),
                    t0 + jnp.arange(chunk, dtype=jnp.int32))
                syms, cs, bad, ok, eof = outs
                return syms, cs, bad, ok, eof, state, ac_state, prev_row

            self._batch_jit["fused_decode"] = jax.jit(run_chunk)
        return self._batch_jit["fused_decode"]

    def bounds_exec(self):
        """Encode-side executable: `[B,card,K,C] probas, [K,C] symbols` →
        per-symbol coder bounds `[C, K]` (+ validity flag)."""
        if "bounds" not in self._batch_jit:
            from ..stream.device_cdf import symbol_bounds

            def bounds(pr, symbols):
                pdf = jnp.transpose(pr[0], (2, 1, 0))        # [C, K, card]
                return symbol_bounds(pdf, symbols.T)

            self._batch_jit["bounds"] = jax.jit(bounds)
        return self._batch_jit["bounds"]

    def codec_symbol_bounds(self, codes: "np.ndarray",
                            chunk: tp.Optional[int] = None):
        """Range-coder bounds for one frame's `[K, T]` codes, entirely on
        device: the pinned chunk scan + a bounds gather per chunk, then one
        tiny `[T, K]` transfer — no per-token host round-trips and no full
        probability transfer. Returns `(lows, highs)` int64 `[T*K]` in the
        (t, k) interleave order the bitstream mandates."""
        import numpy as np
        if chunk is None:
            chunk = self.CODEC_CHUNK
        K, T = codes.shape
        n_chunks = max(1, -(-T // chunk))
        Tp = n_chunks * chunk
        shifted = np.zeros((1, K, Tp), np.int32)
        shifted[0, :, 1:T] = 1 + codes[:, :T - 1]
        symbols = np.zeros((K, Tp), np.int32)
        symbols[:, :T] = codes
        exec_ = self.chunk_exec(1, K, chunk)
        bounds_ = self.bounds_exec()
        state = self.init_stream(batch=1)
        outs = []
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            probas, state = exec_(self.params, jnp.asarray(shifted[:, :, sl]),
                                  state)
            outs.append(bounds_(probas, jnp.asarray(symbols[:, sl])))
        lows = np.concatenate([np.asarray(o[0]) for o in outs])[:T]
        highs = np.concatenate([np.asarray(o[1]) for o in outs])[:T]
        if any(bool(np.asarray(o[2])) for o in outs):
            raise ValueError("You must increase your total_range_bits.")
        return (lows.reshape(-1).astype(np.int64),
                highs.reshape(-1).astype(np.int64))

    # -- batched (multi-segment) codec path --------------------------------

    def batch_bounds_exec(self):
        """Batched encode-side bounds: `[S,card,K,C] probas, [S,K,C] syms`
        → `([S,C,K] lows, highs, bad)`."""
        if "bounds_b" not in self._batch_jit:
            from ..stream.device_cdf import symbol_bounds

            def bounds(pr, symbols):
                pdf = jnp.transpose(pr, (0, 3, 2, 1))        # [S, C, K, card]
                return symbol_bounds(pdf, jnp.transpose(symbols, (0, 2, 1)))

            self._batch_jit["bounds_b"] = jax.jit(bounds)
        return self._batch_jit["bounds_b"]

    def batch_cdf_row_exec(self):
        """Batched decode-side CDF rows: `[S,card,K,C] probas, t` →
        `([S,K,card] int32 rows, bad, row checksum)` — the checksum is
        `bits_checksum(rows)`, comparable against
        `batch_chunk_checksum_exec`."""
        if "cdf_rows_b" not in self._batch_jit:
            from ..stream.device_cdf import quantized_cdf_rows

            def rows(pr, t):
                p_t = jax.lax.dynamic_index_in_dim(pr, t, axis=3,
                                                   keepdims=False)  # [S,card,K]
                r, bad = quantized_cdf_rows(jnp.transpose(p_t, (0, 2, 1)))
                return r, bad, bits_checksum(r)

            self._batch_jit["cdf_rows_b"] = jax.jit(rows)
        return self._batch_jit["cdf_rows_b"]

    def batch_chunk_checksum_exec(self):
        """Batched self-check: `[S,card,K,C] probas` → `[C]` int32
        per-position checksums over the QUANTIZED CDF ROWS derived from
        each `[S,card,K]` probability slice — the same `[S,K,card]` rows
        (and flatten order) `batch_cdf_row_exec` returns and the fused
        decoder pulls from, so all three checksums are directly
        comparable. The CDF builder uses only exactly-rounded ops
        (`stream.device_cdf`), so computing the rows inside this separate
        executable is bit-faithful to computing them anywhere else."""
        if "chunk_cs_b" not in self._batch_jit:
            from ..stream.device_cdf import quantized_cdf_rows

            def cs(pr):
                perpos = jnp.transpose(pr, (3, 0, 2, 1))    # [C, S, K, card]
                rows, _bad = quantized_cdf_rows(perpos)
                bits = rows.reshape(rows.shape[0], -1)
                w = 2 * jnp.arange(bits.shape[1], dtype=jnp.int32) + 1
                return jnp.sum(bits * w[None, :], axis=1)

            self._batch_jit["chunk_cs_b"] = jax.jit(cs)
        return self._batch_jit["chunk_cs_b"]

    def codec_symbol_bounds_batched(self, codes_list, chunk=None):
        """Range-coder bounds for S independent frames encoded in LOCKSTEP
        with one `[S, K, C]` chunk executable (each frame starts from a
        fresh stream state; the batch elements never interact). Frames may
        be ragged (the usual shorter last 48 kHz segment): shorter frames
        are zero-padded and their tail outputs ignored. Returns a list of
        `(lows, highs)` per frame. The matching decoder is
        `stream.compress._decode_frames_lm_batched` — the SAME `[S, K, C]`
        executable, so the bit-exactness argument of `lm_scan_chunk` holds
        per batch element.
        """
        import numpy as np
        if chunk is None:
            chunk = self.CODEC_CHUNK
        S = len(codes_list)
        K = codes_list[0].shape[0]
        Ts = [c.shape[1] for c in codes_list]
        T_max = max(Ts)
        n_chunks = max(1, -(-T_max // chunk))
        Tp = n_chunks * chunk
        shifted = np.zeros((S, K, Tp), np.int32)
        symbols = np.zeros((S, K, Tp), np.int32)
        for s, c in enumerate(codes_list):
            shifted[s, :, 1:Ts[s]] = 1 + c[:, :Ts[s] - 1]
            symbols[s, :, :Ts[s]] = c
        exec_ = self.chunk_exec(S, K, chunk)
        bounds_ = self.batch_bounds_exec()
        state = self.init_stream(batch=S)
        outs = []
        for ci in range(n_chunks):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            probas, state = exec_(self.params, jnp.asarray(shifted[:, :, sl]),
                                  state)
            outs.append(bounds_(probas, jnp.asarray(symbols[:, :, sl])))
        lows = np.concatenate([np.asarray(o[0]) for o in outs], axis=1)
        highs = np.concatenate([np.asarray(o[1]) for o in outs], axis=1)
        # padded positions hold well-formed softmax rows, so the global
        # validity flag is meaningful (same as the single-frame path)
        if any(bool(np.asarray(o[2])) for o in outs):
            raise ValueError("You must increase your total_range_bits.")
        return [(lows[s, :Ts[s]].reshape(-1).astype(np.int64),
                 highs[s, :Ts[s]].reshape(-1).astype(np.int64))
                for s in range(S)]

    def codec_probas(self, codes: "np.ndarray", chunk: tp.Optional[int] = None
                     ) -> "np.ndarray":
        """Teacher-forced probabilities for encoding one frame's `[K, T]`
        codes, computed with the pinned chunk executable: ceil(T/C) device
        dispatches total. Returns `[T, K, card]` float32."""
        import numpy as np
        if chunk is None:
            chunk = self.CODEC_CHUNK
        K, T = codes.shape
        n_chunks = max(1, -(-T // chunk))
        shifted = np.zeros((1, K, n_chunks * chunk), np.int32)
        shifted[0, :, 1:T] = 1 + codes[:, :T - 1]
        exec_ = self.chunk_exec(1, K, chunk)
        state = self.init_stream(batch=1)
        outs = []
        for c in range(n_chunks):
            idx = jnp.asarray(shifted[:, :, c * chunk:(c + 1) * chunk])
            probas, state = exec_(self.params, idx, state)
            outs.append(probas)
        probas_all = np.concatenate(
            [np.asarray(p[0]) for p in outs], axis=-1)[:, :, :T]
        return probas_all.transpose(2, 1, 0)           # [T, K, card]

    def step(self, indices: Array, state: LMStreamState):
        if self._step_jit is None:
            cfg = self.cfg
            self._step_jit = jax.jit(lambda p, i, s: lm_step(p, i, s, cfg))
        return self._step_jit(self.params, indices, state)

    def init_stream(self, batch: int = 1) -> LMStreamState:
        return init_lm_stream(self.cfg, batch)

    def __call__(self, indices: Array,
                 states: tp.Optional[LMStreamState] = None,
                 offset: int = 0):
        """Reference-signature forward (ref model.py:64-83): indices
        `[B, K, T]` (1 + previous code, 0 = missing), optional streaming
        state → `(probas [B, card, K, T], new_states, offset + T)`.
        Chunks are processed through the jitted single-step path."""
        B, K, T = indices.shape
        if states is None:
            states = self.init_stream(batch=B)
        outs = []
        for t in range(T):
            probas, states = self.step(indices[:, :, t], states)
            outs.append(probas)
        return jnp.stack(outs, axis=-1), states, offset + T


def get_lm_model(model, repository: tp.Optional[str] = None) -> LMModel:
    """LM associated with a codec model (ref model.py:265-284)."""
    cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=model.cfg.rvq.bins,
                   num_layers=5, dim=200,
                   past_context=int(3.5 * model.frame_rate))
    checkpoints = {
        "encodec_24khz": "encodec_lm_24khz-1608e3c0.th",
        "encodec_48khz": "encodec_lm_48khz-7add9fc3.th",
    }
    if model.name not in checkpoints:
        raise RuntimeError("No LM pre-trained for the current Encodec model.")
    import torch
    from .torch_zoo import lm_params_from_torch
    name = checkpoints[model.name]
    if repository is not None:
        from pathlib import Path
        state = torch.load(Path(repository) / name, map_location="cpu",
                           weights_only=True)
    else:
        url = "https://dl.fbaipublicfiles.com/encodec/v0/" + name
        state = torch.hub.load_state_dict_from_url(url, map_location="cpu",
                                                   check_hash=True)
    state = {k: v.numpy() for k, v in state.items()}
    params = lm_params_from_torch(state, cfg.n_q, cfg.num_layers)
    return LMModel(cfg, params)
