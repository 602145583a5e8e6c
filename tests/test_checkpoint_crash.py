"""Randomized crash injection for the checkpoint durability contract.

`save_checkpoint` promises: whatever instant the process dies, a complete
generation survives at `model.ckpt` or `model.ckpt.prev` and
`load_checkpoint_with_fallback` returns it. The unit tests simulate
specific failure points (truncation, missing newest); this test earns the
claim empirically — a subprocess checkpoints in a tight loop and is
SIGKILLed at uniformly random instants, covering every phase of the
write/rotate/rename sequence (temp write, fsync, first os.replace,
second os.replace, directory fsync).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WRITER = r"""
import sys
import numpy as np
sys.path.insert(0, {repo!r})
from encodec_tpu.train.checkpoint import save_checkpoint
path = sys.argv[1]
# small state -> saves take ~1 ms, so random kills land in every phase
epoch = 0
while True:
    epoch += 1
    state = {{"w": np.full(64, float(epoch), np.float32)}}
    save_checkpoint(state, epoch, path)
"""


def test_checkpoint_survives_random_sigkill(tmp_path):
    from encodec_tpu.train.checkpoint import load_checkpoint_with_fallback
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "writer.py"
    script.write_text(_WRITER.format(repo=repo))
    path = tmp_path / "model.ckpt"

    rng = np.random.RandomState(0)
    for trial in range(12):
        errlog = tmp_path / f"writer_err_{trial}.log"
        with open(errlog, "wb") as err:
            p = subprocess.Popen([sys.executable, str(script), str(path)],
                                 stderr=err)
        # wait for the first completed save (interpreter startup dominates),
        # then kill at a random instant inside the steady save loop
        # generous: this host can be 1-core and the writer's jax import
        # contends with the rest of the suite (observed >30 s once)
        deadline = time.time() + 120
        while not path.exists() and time.time() < deadline:
            if p.poll() is not None:
                raise AssertionError(
                    f"trial {trial}: writer exited rc={p.returncode} before "
                    f"its first save:\n{errlog.read_text()}")
            time.sleep(0.01)
        assert path.exists(), (
            f"trial {trial}: writer produced no checkpoint within the "
            f"deadline; stderr so far:\n{errlog.read_text()}")
        time.sleep(float(rng.uniform(0, 0.25)))
        p.send_signal(signal.SIGKILL)
        p.wait()
        state, epoch, _ = load_checkpoint_with_fallback(path)
        assert epoch >= 1
        # the loaded generation is internally consistent (state matches
        # its epoch) — a torn write would break this
        np.testing.assert_array_equal(
            state["w"], np.full(64, float(epoch), np.float32),
            err_msg=f"trial {trial}: torn checkpoint at epoch {epoch}")
