"""Mesh helpers: hybrid (multi-slice) construction and multi-host init.

The forced-CPU harness exposes no slice topology, so these tests exercise
the documented fallbacks — the code paths a single-slice deployment and CI
take — plus a collective over the hybrid mesh's axes to prove the logical
shape is usable.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from encodec_tpu.parallel import (initialize_multihost, make_hybrid_mesh,
                                  make_mesh)


def test_hybrid_mesh_fallback_shape_and_collective():
    mesh = make_hybrid_mesh(("data", "model"), ici_shape=(1, 2),
                            dcn_shape=(4, 1))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")

    # psum over both axes through a jitted computation on the hybrid mesh
    x = jnp.arange(8.0).reshape(4, 2)
    x = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    total = jax.jit(lambda v: jnp.sum(v))(x)
    assert float(total) == float(np.arange(8.0).sum())


def test_hybrid_mesh_degenerate_axes_match_plain_mesh():
    hybrid = make_hybrid_mesh(("data",), ici_shape=(8,), dcn_shape=(1,))
    plain = make_mesh(8)
    assert [d.id for d in hybrid.devices.flat] == \
        [d.id for d in plain.devices.flat]


def test_initialize_multihost_single_process_noop():
    # single-process run: must be a clean no-op, not an error
    assert initialize_multihost() is False
    assert jax.process_count() == 1


def test_initialize_multihost_late_call_is_loud():
    # the backend is live in this process (conftest touched devices); a
    # caller who explicitly asks for multi-host must get an error, not a
    # silent single-process fallback (each host would train independently)
    import pytest
    with pytest.raises(RuntimeError, match="before any jax device use"):
        initialize_multihost(coordinator_address="127.0.0.1:1234",
                             num_processes=2, process_id=0)


def test_make_mesh_2d_too_many_devices_is_clear():
    import pytest
    from encodec_tpu.parallel import make_mesh_2d
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(4, 4)  # 16 > the 8-device harness
