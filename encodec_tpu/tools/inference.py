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


def process_dataset(model, dataset, out_dir: str,
                    channel_subdir: bool = True) -> int:
    """Dump codes for every item of a (test-mode) dataset to
    `{out_dir}/[{channel}/]{filename}.npz` with keys `codes` and `fs`
    (= token rate, ref inference.py:154). Returns the number written."""
    # ref inference.py:154: fs = sample_rate / prod(ratios) (token rate)
    token_fs = model.sample_rate / int(np.prod(model.cfg.seanet.ratios))
    count = 0
    for i in range(len(dataset)):
        item = dataset[i]
        codes = extract_codes(model, item["x"])
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
    args = parser.parse_args()

    config = load_config(args.config)
    model = model_from_config(config)
    raw, epoch, _ = load_checkpoint(args.checkpoint)
    state = TrainState(*raw)
    model.params = jax.tree.map(jnp.asarray, state.params)
    model.qstate = jax.tree.map(jnp.asarray, state.qstate)

    ds = BreathingDataset(args.data_root, args.dataset, mode="test",
                          channels={args.channel: 1.0})
    n = process_dataset(model, ds, args.out)
    print(f"wrote {n} code files to {args.out}")


if __name__ == "__main__":
    main()
