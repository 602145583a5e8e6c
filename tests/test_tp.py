"""Tensor-parallel RVQ search: exact equality with the single-device path
on the virtual 8-device mesh."""

import numpy as np

import jax

import jax.numpy as jnp
from jax.sharding import Mesh

from encodec_tpu.parallel import make_mesh
from encodec_tpu.parallel.tp import nearest_codebook_tp, rvq_encode_tp
from encodec_tpu.quant import RVQConfig, init_rvq, rvq_encode

import pytest

# exhaustive parallel/e2e verification tier — run via 'make tests'
pytestmark = pytest.mark.slow


def test_nearest_tp_matches_single_device():
    mesh = make_mesh(8, axis_name="model")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (100, 32))
    embed = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    got = nearest_codebook_tp(x, embed, mesh)
    from encodec_tpu.quant.rvq import _nearest
    ref = _nearest(x, embed)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nearest_tp_tiebreak_lowest_index():
    mesh = make_mesh(8, axis_name="model")
    # duplicate rows across shards: global lowest index must win
    x = jnp.ones((16, 32))
    embed = jnp.tile(jnp.ones((1, 32)), (64, 1))
    got = nearest_codebook_tp(x, embed, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.zeros(16, np.int64))


def test_rvq_encode_tp_matches():
    mesh = make_mesh(8, axis_name="model")
    cfg = RVQConfig(dimension=16, n_q=4, bins=64, kmeans_init=False)
    state = init_rvq(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 16))
    ref = rvq_encode(state, x, cfg)
    got = rvq_encode_tp(state, x, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rvq_encode_tp_2d_mesh_with_dp():
    """dp x tp: batch on 'data', codebook on 'model'."""
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    cfg = RVQConfig(dimension=16, n_q=3, bins=32, kmeans_init=False)
    state = init_rvq(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 16))
    ref = rvq_encode(state, x, cfg)
    # shard flattened batch across 'data'
    got = rvq_encode_tp(state, x, cfg, mesh, batch_axis="data")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
