"""Mesh construction and sharding specs."""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: tp.Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, seq: int,
                 axis_names: tp.Tuple[str, str] = ("data", "seq")) -> Mesh:
    """2-D mesh: batch sharded over `data`, time sharded over `seq`.

    Time sharding of the conv trunk is handled by XLA's SPMD partitioner
    (it inserts the conv halo exchanges); the token-rate LSTM scan gathers
    the (hop-times smaller) sequence implicitly — the same compute split
    `parallel.sp` implements manually for inference.
    """
    avail = jax.devices()
    if data * seq > len(avail):
        raise ValueError(
            f"make_mesh_2d({data}, {seq}) needs {data * seq} devices but "
            f"only {len(avail)} are available")
    devices = np.asarray(avail[:data * seq]).reshape(data, seq)
    return Mesh(devices, axis_names)


def initialize_multihost(coordinator_address: tp.Optional[str] = None,
                         num_processes: tp.Optional[int] = None,
                         process_id: tp.Optional[int] = None) -> bool:
    """Bring up `jax.distributed` for multi-host (DCN-connected) training.

    On TPU pods every argument defaults from the runtime metadata, so a pod
    launcher only calls `initialize_multihost()` before building a mesh —
    after which `jax.devices()` spans all hosts and the same jitted train
    step / `make_hybrid_mesh` code scales out unchanged (collectives ride
    ICI within a slice and DCN across slices). Returns True when
    distributed mode is live, False when running single-process (the
    single-chip/CPU dev case — a deliberate no-op, not an error).

    Replaces the reference's never-initialized `torch.distributed` world
    (encodec/distrib.py:14-29 falls back to rank 0 / world 1).
    """
    import os
    if jax.distributed.is_initialized():
        return True
    # jax.distributed.initialize() must run before the local backend comes
    # up (jax.devices()/process_count()/first jit initialize it, after
    # which initialize() always raises). If the backend is already live:
    # a plain single-process run (the dev/test case) degrades to a no-op,
    # but a caller who clearly *asked* for multi-host — explicit arguments
    # or a coordinator address in the environment — gets a loud error
    # instead of silently training independent per-host copies.
    wants_multihost = any(
        a is not None
        for a in (coordinator_address, num_processes, process_id)
    ) or any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    try:
        from jax._src import xla_bridge
        backend_live = xla_bridge.backends_are_initialized()
    except Exception:
        backend_live = False
    if backend_live:
        if wants_multihost:
            raise RuntimeError(
                "initialize_multihost() must run before any jax device "
                "use (jax.devices()/process_count()/first jit) — the "
                "local backend is already initialized. Call it first in "
                "your launcher.")
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except RuntimeError as e:
        if "backend" in str(e).lower() or "before" in str(e).lower():
            raise RuntimeError(
                "initialize_multihost() must run before any jax device "
                "use — the local backend is already initialized. Call it "
                "first in your launcher.") from e
        if wants_multihost:
            # Multi-host was explicitly requested (arguments or coordinator
            # env var): a failed handshake must NOT silently degrade to N
            # independent per-host runs — that trains N diverging copies.
            raise RuntimeError(
                "initialize_multihost(): coordinator handshake failed but "
                "multi-host was explicitly requested — refusing to fall "
                "back to single-process training.") from e
        return False  # no multi-host intent expressed → single-process run
    except ValueError as e:
        if wants_multihost:
            raise RuntimeError(
                "initialize_multihost(): could not resolve the distributed "
                "environment but multi-host was explicitly requested — "
                "refusing to fall back to single-process training.") from e
        # no coordinator/environment to discover → single-process run
        return False


def make_hybrid_mesh(axis_names: tp.Tuple[str, ...],
                     ici_shape: tp.Tuple[int, ...],
                     dcn_shape: tp.Tuple[int, ...]) -> Mesh:
    """Multi-slice mesh: per-axis device count = `ici * dcn`, with the DCN
    (cross-slice) factor outermost so that the heavy collectives of an axis
    stay on ICI within a slice and only the `dcn`-factored axes (typically
    plain data parallelism) cross the slower DCN links.

    Uses the runtime's slice topology (`mesh_utils.create_hybrid_device_mesh`)
    when devices expose one; on a single slice — or the forced-CPU test
    harness, whose devices carry no `slice_index` — it falls back to a plain
    row-major reshape with identical logical shape, so code written against
    the hybrid mesh runs unchanged in tests and single-slice deployments.
    """
    assert len(axis_names) == len(ici_shape) == len(dcn_shape)
    devices = jax.devices()
    shape = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
    n = int(np.prod(shape))
    assert n <= len(devices), (shape, len(devices))
    if getattr(devices[0], "slice_index", None) is not None:
        from collections import defaultdict
        from jax.experimental import mesh_utils
        # create_hybrid_device_mesh requires its device list to contain
        # EXACTLY prod(dcn) slices x prod(ici) devices — select a submesh
        # subset honoring the slice topology instead of passing everything
        # (which raises whenever the requested mesh is smaller than the pod)
        n_slices = int(np.prod(dcn_shape))
        per_slice = int(np.prod(ici_shape))
        groups: tp.Dict[int, list] = defaultdict(list)
        for d in devices:
            groups[d.slice_index].append(d)
        slice_ids = sorted(groups)
        if len(slice_ids) < n_slices:
            raise ValueError(
                f"hybrid mesh needs {n_slices} slices, found "
                f"{len(slice_ids)}")
        subset = []
        for sid in slice_ids[:n_slices]:
            g = sorted(groups[sid], key=lambda d: d.id)
            if len(g) < per_slice:
                raise ValueError(
                    f"slice {sid} has {len(g)} devices, need {per_slice}")
            subset.extend(g[:per_slice])
        arr = mesh_utils.create_hybrid_device_mesh(
            list(ici_shape), list(dcn_shape), devices=subset)
    else:
        arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host array onto the mesh, batch-sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh, axis_name))
