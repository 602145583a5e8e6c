"""utils/profiling: stage timers must measure device work, not dispatch."""

import numpy as np

import jax
import jax.numpy as jnp

from encodec_tpu.utils.profiling import StageTimer, annotate, device_trace


def test_stage_timer_blocks_and_averages():
    timer = StageTimer()
    fn = jax.jit(lambda x: jnp.sin(x).sum())
    x = jnp.ones((256,))
    for _ in range(3):
        with timer.stage("sin") as s:
            s.watch(fn(x))
    with timer.stage("noop"):
        pass
    rep = timer.report()
    assert set(rep) == {"sin", "noop"}
    assert timer.counts["sin"] == 3
    assert rep["sin"] >= 0.0 and np.isfinite(rep["sin"])


def test_stage_timer_records_on_exception():
    timer = StageTimer()
    try:
        with timer.stage("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert timer.counts["boom"] == 1  # finally path still records


def test_annotate_and_trace(tmp_path):
    with annotate("region"):
        v = jax.jit(lambda x: x * 2)(jnp.ones(()))
    jax.block_until_ready(v)
    with device_trace(str(tmp_path / "trace")):
        jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(())))
    assert any((tmp_path / "trace").rglob("*"))  # trace artifacts written
