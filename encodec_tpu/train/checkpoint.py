"""Checkpoint save/resume for training state.

Behavioral reference: encodec/train.py:504-540 — per-run directory with
`model.pth`/`disc.pth` holding model+optimizer+scheduler and the epoch;
resume restarts at epoch+1 with the snapshotted config.

Format here: a single `.ckpt` file per save (pickled treedef + npz-style
arrays via numpy), holding the full TrainState pytree and the epoch. The
quantizer EMA state and PRNG key ride along in the pytree — the pieces the
reference's DDP setup could not keep consistent (README.md:213-215).

Durability contract (beyond the reference's bare `torch.save`):
- Writes are atomic: payload goes to a temp file, is fsync'd, and is
  renamed over the target (`os.replace`), so a crash mid-save can never
  truncate an existing checkpoint.
- Each save rotates the previous checkpoint to `<path>.prev` first, so
  even a save that is interrupted *between* the rotation and the final
  rename — or a checkpoint corrupted at rest — leaves a complete older
  generation to resume from.
- Payloads carry a `format_version`; loading refuses versions from the
  future instead of mis-deserializing them.
- `load_checkpoint_with_fallback` transparently falls back to `.prev`
  when the newest file is truncated/corrupt (the mid-save-SIGKILL case).
"""

from __future__ import annotations

import logging
import os
import pickle
import threading
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1

log = logging.getLogger(__name__)


class CheckpointVersionError(ValueError):
    """The file was written by a NEWER build. Deliberately not swallowed by
    `load_checkpoint_with_fallback`: silently resuming from the stale
    `.prev` generation would, two saves later, rotate the newer checkpoint
    out of existence — the refusal must stop the run, not degrade it."""


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def previous_path(path: tp.Union[str, Path]) -> Path:
    """The rotated previous-generation checkpoint next to `path`."""
    path = Path(path)
    return path.with_suffix(path.suffix + ".prev")


def save_checkpoint(state, epoch: int, path: tp.Union[str, Path],
                    extra: tp.Optional[dict] = None,
                    keep_previous: bool = True) -> None:
    payload = {
        "format_version": FORMAT_VERSION,
        "epoch": int(epoch),
        "state": _to_numpy(state),
        "extra": extra or {},
    }
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh, protocol=pickle.HIGHEST_PROTOCOL)
        fh.flush()
        os.fsync(fh.fileno())
    if keep_previous and path.exists():
        # rotate before the final rename: whatever happens from here on,
        # a complete generation survives at either `path` or `path.prev`
        os.replace(path, previous_path(path))
    os.replace(tmp, path)
    # persist the renames themselves (POSIX: directory fsync)
    try:
        dirfd = os.open(path.parent or Path("."), os.O_RDONLY)
        try:
            os.fsync(dirfd)
        finally:
            os.close(dirfd)
    except OSError:
        pass  # non-POSIX or restricted fs — renames are still atomic


def load_checkpoint(path: tp.Union[str, Path]):
    """Returns (state_pytree, epoch, extra). Resume at epoch+1.

    Raises on a truncated/corrupt file or an unknown future format —
    callers wanting graceful degradation use
    `load_checkpoint_with_fallback`.
    """
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    version = payload.get("format_version", 0)  # pre-versioning saves = 0
    if version > FORMAT_VERSION:
        raise CheckpointVersionError(
            f"checkpoint {path} has format_version={version}, newer than "
            f"this build's {FORMAT_VERSION} — refusing to load")
    return payload["state"], payload["epoch"], payload.get("extra", {})


def load_checkpoint_with_fallback(path: tp.Union[str, Path]):
    """`load_checkpoint`, falling back to the rotated `.prev` generation
    when the newest file is truncated or corrupt (e.g. SIGKILL mid-save on
    a filesystem without atomic-rename durability).

    A missing newest file with an intact `.prev` (a kill landing between
    `save_checkpoint`'s two renames) also falls back. A
    `CheckpointVersionError` (file from a newer build) is re-raised — see
    its docstring.

    Returns (state, epoch, extra). Raises only when no loadable
    generation exists.
    """
    path = Path(path)
    try:
        return load_checkpoint(path)
    except CheckpointVersionError:
        raise
    except (EOFError, pickle.UnpicklingError, ValueError, OSError,
            KeyError, AttributeError) as e:
        prev = previous_path(path)
        if not prev.exists():
            raise
        log.warning(
            "checkpoint %s is unreadable (%s: %s); falling back to "
            "previous generation %s", path, type(e).__name__, e, prev)
        return load_checkpoint(prev)


class AsyncCheckpointer:
    """Overlap checkpoint writes with training.

    `save()` takes a cheap on-device snapshot (`jnp.copy` under jit — new
    buffers, so the trainer's donated-into-the-next-step state cannot be
    clobbered while we read it) and hands the device->host transfer plus
    the atomic `save_checkpoint` write to a background thread. At most one
    write is in flight; a second `save()` waits for the first (checkpoint
    ordering is preserved, and a slow disk cannot queue unbounded
    snapshots). Call `wait()` before reading the file or exiting.

    The reference has no equivalent (torch.save blocks the train loop,
    ref train.py:504-522).
    """

    def __init__(self):
        self._thread: tp.Optional[threading.Thread] = None
        self._error: tp.Optional[BaseException] = None
        self._snapshot = None  # jitted device-copy, built on first use

    def save(self, state, epoch: int, path: tp.Union[str, Path],
             extra: tp.Optional[dict] = None,
             keep_previous: bool = True) -> None:
        self.wait()
        if self._snapshot is None:
            self._snapshot = jax.jit(
                lambda s: jax.tree.map(jnp.copy, s))
        snap = self._snapshot(state)

        def run():
            try:
                save_checkpoint(snap, epoch, path, extra=extra,
                                keep_previous=keep_previous)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) completes; re-raise
        any error it hit."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
