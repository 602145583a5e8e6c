"""Checkpoint save/resume for training state.

Behavioral reference: encodec/train.py:504-540 — per-run directory with
`model.pth`/`disc.pth` holding model+optimizer+scheduler and the epoch;
resume restarts at epoch+1 with the snapshotted config.

Format here: a single `.ckpt` file per save (pickled treedef + npz-style
arrays via numpy), holding the full TrainState pytree and the epoch. The
quantizer EMA state and PRNG key ride along in the pytree — the pieces the
reference's DDP setup could not keep consistent (README.md:213-215).
"""

from __future__ import annotations

import pickle
import typing as tp
from pathlib import Path

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state, epoch: int, path: tp.Union[str, Path],
                    extra: tp.Optional[dict] = None) -> None:
    payload = {
        "epoch": int(epoch),
        "state": _to_numpy(state),
        "extra": extra or {},
    }
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: tp.Union[str, Path]):
    """Returns (state_pytree, epoch, extra). Resume at epoch+1."""
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    return payload["state"], payload["epoch"], payload.get("extra", {})
