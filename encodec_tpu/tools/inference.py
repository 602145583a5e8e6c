"""Batch token extraction and codebook diagnostics.

Behavioral reference: encodec/inference.py — dump RVQ codes per night to
npz at the token rate (`process_dataset`, 131-157), per-codebook token
histograms (`get_code_distribution`, 159-219) and decode-from-most-frequent
probes (`plot_most_frequent_signals`, 221-273).
"""

from __future__ import annotations

import os
import typing as tp

import numpy as np

import jax
import jax.numpy as jnp


def extract_codes(model, x: np.ndarray) -> np.ndarray:
    """Encode one `[C, T]` signal → codes `[K, T']` (int32)."""
    frames = model.encode(jnp.asarray(x)[None])
    codes = np.concatenate([np.asarray(f[0][0]) for f in frames], axis=-1)
    return codes.astype(np.int32)


class _StreamExtractor:
    """Fixed-chunk code extraction: a handful of compiled executables
    shared by every signal length — and EXACT for every length.

    `extract_codes` jit-compiles one encode graph per distinct signal
    length — real nights all differ, so a dataset sweep pays a fresh XLA
    compile per file (a torch/GPU habit the reference could afford;
    measured ~minutes per compile on a remote-compiled TPU). This variant
    streams hop-multiple chunks through the jit-stable streaming encoder
    (`models/streaming.py`), decomposes the sub-chunk remainder into a
    binary ladder of hop-multiple pieces (≤ log2(chunk_hops) extra
    executables, each compiled once and reused by every night), and
    consumes a non-hop-multiple tail with `encoder_stream_finish` — the
    batch path's end-of-signal reflect padding — so streamed codes equal
    `extract_codes` bit-for-bit for ANY length. (The finish executable
    retraces per distinct `T % hop`; it is a one-frame graph, so those
    compiles are tiny.) `exact_tail=False` restores the old zero-padded
    tail (one executable total, final partial frame approximate).

    Signals shorter than one chunk fall back to the offline path (they
    cannot prime the streaming contexts at chunk shape).
    """

    def __init__(self, model, chunk_hops: int = 1024,
                 exact_tail: bool = True):
        from ..models.streaming import (encoder_stream_step,
                                        encoder_stream_finish,
                                        min_first_chunk)
        from ..quant import rvq_encode
        cfg = model.cfg
        if cfg.normalize or cfg.segment is not None:
            raise ValueError(
                "streaming extraction bypasses per-segment scaling — use "
                "the offline extract_codes for normalize/segmented models")
        self.model = model
        self.hop = cfg.seanet.hop_length
        self.chunk = chunk_hops * self.hop
        self.exact_tail = exact_tail
        need = min_first_chunk(cfg.seanet)
        if self.chunk < need:
            raise ValueError(
                f"chunk ({self.chunk} samples) must be >= min_first_chunk "
                f"({need}) to prime the streaming conv contexts exactly")
        self._build_execs()

    def _exec_key(self):
        # bit-equality with extract_codes requires the batch encoder's
        # live precision AND conv lowering (VPU shift form at
        # 'high'/'fast'); a construction-time snapshot would silently go
        # stale after model.set_precision()
        return (getattr(self.model, "_precision", None),
                getattr(self.model, "_encode_lowering", "mxu"),
                self.model.n_q_active)

    def _build_execs(self):
        from ..models.streaming import (encoder_stream_step,
                                        encoder_stream_finish)
        from ..quant import rvq_encode
        cfg = self.model.cfg
        self._key = self._exec_key()
        precision, lowering, n_q = self._key

        @jax.jit
        def first_step(params, qstate, xt):
            emb, st = encoder_stream_step(params["encoder"], xt, None,
                                          cfg.seanet, precision=precision,
                                          lowering=lowering)
            codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q,
                               precision=precision)
            return codes, st

        @jax.jit
        def step(params, qstate, xt, st):
            emb, st = encoder_stream_step(params["encoder"], xt, st,
                                          cfg.seanet, precision=precision,
                                          lowering=lowering)
            codes = rvq_encode(qstate, emb, cfg.rvq, n_q=n_q,
                               precision=precision)
            return codes, st

        @jax.jit
        def finish(params, qstate, xt, st):
            emb = encoder_stream_finish(params["encoder"], xt, st,
                                        cfg.seanet, precision=precision,
                                        lowering=lowering)
            return rvq_encode(qstate, emb, cfg.rvq, n_q=n_q,
                              precision=precision)

        self._first, self._step, self._finish = first_step, step, finish

    def __call__(self, x: np.ndarray) -> np.ndarray:
        if self._exec_key() != self._key:
            # model.set_precision() (or an n_q change) since the last
            # build — rebuild so streamed codes keep matching extract_codes
            self._build_execs()
        x = np.asarray(x)
        C, T = x.shape
        hop = self.hop
        n_frames = -(-T // hop)
        T_full = (T // hop) * hop
        r = T - T_full
        if not self.exact_tail or r == 0:
            return self._zero_padded(x, T, n_frames)
        if T_full < self.chunk:
            return extract_codes(self.model, x)  # too short to prime
        xt_all = np.ascontiguousarray(x.T, np.float32)[None]  # [1, T, C]
        boundary = (T_full // self.chunk) * self.chunk
        outs = []
        codes, st = self._first(self.model.params, self.model.qstate,
                                jnp.asarray(xt_all[:, :self.chunk]))
        outs.append(np.asarray(codes))
        for off in range(self.chunk, boundary, self.chunk):
            codes, st = self._step(self.model.params, self.model.qstate,
                                   jnp.asarray(xt_all[:, off:off + self.chunk]),
                                   st)
            outs.append(np.asarray(codes))
        # binary ladder over the remaining full hops: the remainder m is
        # decomposed by ITS OWN binary representation (piece sizes are
        # powers of two in hops), so any m < chunk_hops is fully consumed
        # by ≤ log2(chunk_hops) executables. Seeding the ladder from
        # chunk_hops//2 and only halving would strand remainders whenever
        # chunk_hops is not a power of two (e.g. chunk_hops=48, m=2),
        # silently dropping trailing frames.
        off = boundary
        m = (T_full - boundary) // hop
        b = 1 << (m.bit_length() - 1) if m > 0 else 0
        while m > 0:
            if m >= b:
                codes, st = self._step(
                    self.model.params, self.model.qstate,
                    jnp.asarray(xt_all[:, off:off + b * hop]), st)
                outs.append(np.asarray(codes))
                off += b * hop
                m -= b
            b //= 2
        assert off == T_full, (off, T_full, hop)
        codes = self._finish(self.model.params, self.model.qstate,
                             jnp.asarray(xt_all[:, T_full:]), st)
        outs.append(np.asarray(codes))
        return np.concatenate(outs, axis=-1)[:, 0].astype(np.int32)

    def _zero_padded(self, x: np.ndarray, T: int,
                     n_frames: int) -> np.ndarray:
        C = x.shape[0]
        Tp = -(-T // self.chunk) * self.chunk
        xp = np.zeros((1, Tp, C), np.float32)
        xp[0, :T] = x.T
        outs, st = [], None
        for off in range(0, Tp, self.chunk):
            xt = jnp.asarray(xp[:, off:off + self.chunk])
            if st is None:
                codes, st = self._first(self.model.params, self.model.qstate,
                                        xt)
            else:
                codes, st = self._step(self.model.params, self.model.qstate,
                                       xt, st)
            outs.append(np.asarray(codes))
        return np.concatenate(
            outs, axis=-1)[:, 0][:, :n_frames].astype(np.int32)


def process_dataset(model, dataset, out_dir: str,
                    channel_subdir: bool = True,
                    stream_chunk_hops: tp.Optional[int] = None) -> int:
    """Dump codes for every item of a (test-mode) dataset to
    `{out_dir}/[{channel}/]{filename}.npz` with keys `codes` and `fs`
    (= token rate, ref inference.py:154). Returns the number written.

    `stream_chunk_hops` (causal models): extract through the fixed-chunk
    streaming encoder so ALL nights share one compiled executable instead
    of one jit compile per distinct night length — see `_StreamExtractor`
    for the (tiny) tail caveat."""
    # ref inference.py:154: fs = sample_rate / prod(ratios) (token rate)
    token_fs = model.sample_rate / int(np.prod(model.cfg.seanet.ratios))
    if stream_chunk_hops is None:
        import functools
        extract = functools.partial(extract_codes, model)
    else:
        extract = _StreamExtractor(model, stream_chunk_hops)
    count = 0
    for i in range(len(dataset)):
        item = dataset[i]
        codes = extract(item["x"])
        sub = os.path.join(out_dir, item["selected_channel"]) \
            if channel_subdir else out_dir
        os.makedirs(sub, exist_ok=True)
        np.savez(os.path.join(sub, item["filename"]), codes=codes,
                 fs=token_fs)
        count += 1
    return count


def code_distribution(all_codes: np.ndarray, bins: int) -> dict:
    """Per-codebook histogram + empirical entropy.

    all_codes: `[K, N]` (or `[K, B, T]`, flattened). Returns
    {"counts": [K, bins], "probs", "entropy": [K]} (ref inference.py:159,
    train.py:325-343)."""
    codes = all_codes.reshape(all_codes.shape[0], -1)
    K = codes.shape[0]
    counts = np.stack([np.bincount(codes[k], minlength=bins)
                       for k in range(K)])
    probs = counts / np.maximum(1, counts.sum(axis=1, keepdims=True))
    entropy = np.array([
        float(-(p[p > 0] * np.log2(p[p > 0])).sum()) for p in probs])
    return {"counts": counts, "probs": probs, "entropy": entropy}


def decode_most_frequent(model, counts: np.ndarray, length: int) -> np.ndarray:
    """Decode a constant stream of each codebook's most frequent token —
    the reference's 'what does the dominant token sound like' probe
    (inference.py:221-273). Returns `[C, T]` audio."""
    top = counts.argmax(axis=1)                      # [K]
    codes = np.tile(top[None, :, None], (1, 1, length))  # [1, K, T]
    out = model.decode([(jnp.asarray(codes.astype(np.int32)), None)])
    return np.asarray(out[0])


def main():
    from ..utils import honor_platform_env
    honor_platform_env()
    import argparse
    from ..train.config import load_config
    from ..train.trainer import model_from_config
    from ..train.checkpoint import load_checkpoint
    from ..train.steps import TrainState
    from ..data import BreathingDataset

    parser = argparse.ArgumentParser("encodec_tpu.tools.inference")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--channel", default="thorax")
    parser.add_argument("--out", required=True)
    parser.add_argument("--stream_chunk_hops", type=int, default=None,
                        help="fixed-chunk streaming extraction (causal "
                             "models): one compiled executable for every "
                             "night length instead of one XLA compile per "
                             "distinct length")
    args = parser.parse_args()

    config = load_config(args.config)
    model = model_from_config(config)
    raw, epoch, _ = load_checkpoint(args.checkpoint)
    state = TrainState(*raw)
    model.params = jax.tree.map(jnp.asarray, state.params)
    model.qstate = jax.tree.map(jnp.asarray, state.qstate)

    ds = BreathingDataset(args.data_root, args.dataset, mode="test",
                          channels={args.channel: 1.0})
    n = process_dataset(model, ds, args.out,
                        stream_chunk_hops=args.stream_chunk_hops)
    print(f"wrote {n} code files to {args.out}")


if __name__ == "__main__":
    main()
