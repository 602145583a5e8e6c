"""Checkpoint save/resume for training state.

Behavioral reference: encodec/train.py:504-540 — per-run directory with
`model.pth`/`disc.pth` holding model+optimizer+scheduler and the epoch;
resume restarts at epoch+1 with the snapshotted config.

Format here (v2): a single `.ckpt` file per save — an npz (zip) holding
the pytree leaves as plain arrays plus a JSON manifest describing the
tree structure (dicts/lists/tuples/namedtuples by name+fields), epoch and
extra metadata. Loading uses `np.load(allow_pickle=False)` and `json` —
NO code path can execute attacker-controlled bytes, unlike `pickle` (and
the reference's `torch.load`, ref train.py:504-540) where loading an
untrusted checkpoint is arbitrary code execution. v1 (pickled) files are
refused loudly with a migration note. The quantizer EMA state and PRNG
key ride along in the pytree — the pieces the reference's DDP setup
could not keep consistent (README.md:213-215).

Structure restore: pass `target=` (a pytree of the same structure, e.g.
the freshly-initialized TrainState) to get leaves rebound into YOUR
classes. Without a target, namedtuple nodes are resolved against a FIXED
allowlist of this framework's (and optax's) state modules by saved
(name, fields) — matching nodes come back as the canonical classes, so
they remain pytree-compatible with freshly built states (jit caches,
`lax.cond` branches and donation all key on the class). Unmatched nodes
fall back to synthesized `collections.namedtuple` types — field access
and unpacking behave identically, only class identity differs. The
allowlist keeps deserialization code-execution-free: the manifest can
never name a module to import.

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

import collections
import json
import logging
import os
import threading
import typing as tp
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2

log = logging.getLogger(__name__)


class CheckpointVersionError(ValueError):
    """The file's format cannot be loaded by this build. For NEWER
    versions, deliberately not swallowed by `load_checkpoint_with_fallback`:
    silently resuming from the stale `.prev` generation would, two saves
    later, rotate the newer checkpoint out of existence — the refusal must
    stop the run, not degrade it. Also raised (with a migration note) for
    v1 pickle files, which this build refuses to deserialize."""


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# -- pure-data tree structure codec (JSON-able; no pickle anywhere) ---------

def _encode_struct(x, leaves: list):
    """Recursively describe a pytree as JSON-able data, appending leaves
    (converted to numpy) to `leaves`. Handles dict/list/tuple/namedtuple/
    None containers; everything else is a leaf array/scalar."""
    if x is None:
        return {"t": "none"}
    if isinstance(x, dict):
        keys = list(x.keys())
        enc_keys = []
        for k in keys:
            if isinstance(k, str):
                enc_keys.append(["s", k])
            elif isinstance(k, (int, np.integer)):
                enc_keys.append(["i", int(k)])
            else:
                raise TypeError(f"unsupported dict key in checkpoint: {k!r}")
        return {"t": "dict", "k": enc_keys,
                "c": [_encode_struct(x[k], leaves) for k in keys]}
    if isinstance(x, tuple) and hasattr(x, "_fields"):   # namedtuple
        return {"t": "nt", "n": type(x).__name__, "f": list(x._fields),
                "c": [_encode_struct(v, leaves) for v in x]}
    if isinstance(x, tuple):
        return {"t": "tuple", "c": [_encode_struct(v, leaves) for v in x]}
    if isinstance(x, list):
        return {"t": "list", "c": [_encode_struct(v, leaves) for v in x]}
    # leaf: remember the python-scalar kind so load restores exact types
    kind = "a"
    if isinstance(x, bool):
        kind = "b"
    elif isinstance(x, int):
        kind = "i"
    elif isinstance(x, float):
        kind = "f"
    idx = len(leaves)
    leaves.append(np.asarray(x))
    return {"t": "leaf", "i": idx, "k": kind}


# Modules scanned for canonical namedtuple state classes when loading
# without `target`. A FIXED allowlist (never taken from the file) keeps
# the no-code-execution property: json can pick among these classes but
# can never cause an import of anything else.
_NT_MODULES = (
    "encodec_tpu.quant.rvq",        # RVQState
    "encodec_tpu.train.steps",      # TrainState, LossWeights
    "encodec_tpu.models.lm",        # LMStreamState
    "encodec_tpu.models.ilm",       # ILMStreamState, ILMChunkCarry
    "optax",                        # ScaleByAdamState, EmptyState, ...
)


def _canonical_namedtuples() -> dict:
    """(name, fields) -> class, scanned once from `_NT_MODULES`."""
    reg = getattr(_canonical_namedtuples, "_reg", None)
    if reg is None:
        import importlib
        reg = {}
        for modname in _NT_MODULES:
            try:
                mod = importlib.import_module(modname)
            except Exception:  # pragma: no cover — optional module absent
                continue
            for obj in vars(mod).values():
                if (isinstance(obj, type) and issubclass(obj, tuple)
                        and hasattr(obj, "_fields")):
                    reg.setdefault((obj.__name__, tuple(obj._fields)), obj)
        _canonical_namedtuples._reg = reg
    return reg


def _decode_struct(node: dict, leaves: tp.Sequence[np.ndarray],
                   nt_cache: tp.Dict[tuple, type]) -> tp.Any:
    t = node["t"]
    if t == "none":
        return None
    if t == "dict":
        keys = [k if tag == "s" else int(k) for tag, k in node["k"]]
        return {k: _decode_struct(c, leaves, nt_cache)
                for k, c in zip(keys, node["c"])}
    if t == "nt":
        sig = (node["n"], tuple(node["f"]))
        if sig not in nt_cache:
            nt_cache[sig] = _canonical_namedtuples().get(
                sig) or collections.namedtuple(  # type: ignore[misc]
                    node["n"], list(node["f"]))
        vals = [_decode_struct(c, leaves, nt_cache) for c in node["c"]]
        return nt_cache[sig](*vals)
    if t == "tuple":
        return tuple(_decode_struct(c, leaves, nt_cache) for c in node["c"])
    if t == "list":
        return [_decode_struct(c, leaves, nt_cache) for c in node["c"]]
    arr = leaves[node["i"]]
    kind = node.get("k", "a")
    if kind == "b":
        return bool(arr)
    if kind == "i":
        return int(arr)
    if kind == "f":
        return float(arr)
    return arr


def previous_path(path: tp.Union[str, Path]) -> Path:
    """The rotated previous-generation checkpoint next to `path`."""
    path = Path(path)
    return path.with_suffix(path.suffix + ".prev")


def save_checkpoint(state, epoch: int, path: tp.Union[str, Path],
                    extra: tp.Optional[dict] = None,
                    keep_previous: bool = True) -> None:
    leaves: tp.List[np.ndarray] = []
    tree = _encode_struct(_to_numpy(state), leaves)
    manifest = json.dumps({
        "format_version": FORMAT_VERSION,
        "epoch": int(epoch),
        "extra": extra or {},       # must be JSON-serializable
        "tree": tree,
        "nleaves": len(leaves),
    }).encode("utf-8")
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __manifest__=np.frombuffer(manifest, np.uint8),
                 **{f"L{i}": a for i, a in enumerate(leaves)})
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


def load_checkpoint(path: tp.Union[str, Path], target=None):
    """Returns (state_pytree, epoch, extra). Resume at epoch+1.

    With `target` (a pytree of identical structure, e.g. a freshly
    initialized TrainState) the leaves are rebound into the target's own
    container classes; otherwise namedtuple nodes come back as
    synthesized equivalents (see module docstring).

    Deserialization is pickle-free: `np.load(allow_pickle=False)` + JSON.
    Raises on a truncated/corrupt file, an unknown future format, or a
    v1 (pickled) file — callers wanting graceful degradation use
    `load_checkpoint_with_fallback`.
    """
    with open(path, "rb") as fh:
        head = fh.read(4)
    if head[:2] == b"\x80" or head[:1] == b"(":
        raise CheckpointVersionError(
            f"checkpoint {path} is a v1 (pickled) file. This build no "
            "longer deserializes pickle — loading one could execute "
            "arbitrary code. Migrate it with a TRUSTED round-3 build: "
            "load there, re-save, and it becomes the pickle-free v2 "
            "format.")
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode("utf-8"))
        version = manifest.get("format_version", 0)
        if version > FORMAT_VERSION:
            raise CheckpointVersionError(
                f"checkpoint {path} has format_version={version}, newer "
                f"than this build's {FORMAT_VERSION} — refusing to load")
        leaves = [z[f"L{i}"] for i in range(manifest["nleaves"])]
    state = _decode_struct(manifest["tree"], leaves, {})
    if target is not None:
        treedef = jax.tree.structure(target)
        flat = jax.tree.leaves(state)
        state = jax.tree.unflatten(treedef, flat)
    return state, manifest["epoch"], manifest.get("extra", {})


def load_checkpoint_with_fallback(path: tp.Union[str, Path], target=None):
    """`load_checkpoint`, falling back to the rotated `.prev` generation
    when the newest file is truncated or corrupt (e.g. SIGKILL mid-save on
    a filesystem without atomic-rename durability).

    A missing newest file with an intact `.prev` (a kill landing between
    `save_checkpoint`'s two renames) also falls back. A
    `CheckpointVersionError` (file from a newer build, or a refused v1
    pickle) is re-raised — see its docstring.

    Returns (state, epoch, extra). Raises only when no loadable
    generation exists.
    """
    path = Path(path)
    try:
        return load_checkpoint(path, target=target)
    except CheckpointVersionError:
        raise
    except (EOFError, zipfile.BadZipFile, ValueError, OSError,
            KeyError, AttributeError, json.JSONDecodeError) as e:
        prev = previous_path(path)
        if not prev.exists():
            raise
        log.warning(
            "checkpoint %s is unreadable (%s: %s); falling back to "
            "previous generation %s", path, type(e).__name__, e, prev)
        return load_checkpoint(prev, target=target)


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
