"""End-to-end trainer smoke: synthetic npz data → epochs → checkpoint/resume."""

import os

import numpy as np
import pytest
import yaml

from encodec_tpu.data import BreathingDataset, MergedDataset, DataLoader
from encodec_tpu.train.config import load_config
from encodec_tpu.train.trainer import Trainer


@pytest.fixture
def tiny_config(tmp_path):
    cfg = {
        "exp_details": {"name": "tiny", "description": "test"},
        "common": {"log_interval": 1, "max_epoch": 3, "seed": 0,
                   "gradient_clipping": True},
        "dataset": {"root": None, "batch_size": 2, "max_length": 600,
                    "debug": True, "cv": 0},
        "checkpoint": {"save_every": 2},
        "optimization": {"lr": 1e-3, "disc_lr": 1e-3},
        "loss": {"weight_l1": 1.0, "weight_l2": 0.0, "weight_commit": 0.25,
                 "weight_freq": 0.25, "weight_g": 3.0, "weight_feat": 3.0,
                 "alpha": 0.01, "bandwidth": None, "n_fft": 64,
                 "win_length": 64, "hop_length": 16,
                 "commit_start_epoch": 2},
        "lr_scheduler": {"warmup_epoch": 2},
        "model": {"ratios": [5, 2, 1], "bins": 32, "dimension": 16,
                  "target_bandwidths": [0.8], "train_discriminator": True,
                  "train_discriminator_start_epoch": 2,
                  "train_discriminator_prob": 1.0,
                  "disc_hop_lengths": [16], "disc_win_lengths": [64],
                  "disc_n_ffts": [64], "filters": 4,
                  "audio_normalize": False, "causal": True,
                  "norm": "layer_norm", "segment": "None",
                  "name": "my_encodec", "sample_rate": 10, "channels": 1},
        "distributed": {"data_parallel": False},
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.dump(cfg))
    return str(path)


@pytest.fixture
def loaders(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "data" / "synth" / "thorax"
    d.mkdir(parents=True)
    for i in range(6):
        t = np.arange(900) / 10.0
        sig = np.sin(2 * np.pi * 0.3 * t) + 0.05 * rng.randn(900)
        np.savez(d / f"n{i}.npz", data=sig.astype(np.float32), fs=10)
    ds_rng = np.random.RandomState(1)
    tr = BreathingDataset(str(tmp_path / "data"), "synth", mode="train",
                          max_length=600, rng=ds_rng)
    va = BreathingDataset(str(tmp_path / "data"), "synth", mode="val",
                          max_length=600, rng=ds_rng)
    m_tr = MergedDataset([tr], [1.0], sfreq=0.008, debug=True, rng=ds_rng)
    m_va = MergedDataset([va], [1.0], sfreq=0.004, debug=True, rng=ds_rng)
    return (DataLoader(m_tr, 2, seed=0), DataLoader(m_va, 2, seed=0))


def test_trainer_fit_eval_checkpoint_resume(tiny_config, loaders, tmp_path):
    config = load_config(tiny_config)
    log_dir = str(tmp_path / "run")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    epochs_seen = []
    trainer.fit(max_epochs=3, on_epoch=lambda e, m: epochs_seen.append(e))
    assert epochs_seen == [1, 2, 3]
    assert os.path.exists(os.path.join(log_dir, "model.ckpt"))

    # eval produces entropy stats
    out = trainer.evaluate(3)
    assert "code_entropy_mean" in out
    assert np.isfinite(out["Loss"])

    # resume continues from the saved epoch
    trainer2 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    assert trainer2.start_epoch == 4
    # weights identical after restore
    import jax
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_with_balancer(tiny_config, loaders, tmp_path):
    import yaml
    cfg_dict = yaml.safe_load(open(tiny_config))
    cfg_dict["balancer"] = {"weights": {"l_t": 1.0, "l_f": 1.0}}
    cfg_dict["loss"]["use_balancer"] = True
    cfg_dict["model"]["train_discriminator"] = False
    path = tmp_path / "bal.yaml"
    path.write_text(yaml.dump(cfg_dict))
    config = load_config(str(path))
    trainer = Trainer(config, loaders[0], loaders[1], str(tmp_path / "runb"))
    assert trainer.balancer is not None and trainer.use_balancer
    trainer.fit(max_epochs=1)
    out = trainer.evaluate(1, save_figure=False)
    assert np.isfinite(out["Loss"])


def test_run_dir_is_self_contained_for_resume(tiny_config, loaders, tmp_path):
    """Resume needs only the run directory: the Trainer snapshots
    config.yaml on construction and embeds the config dict in the
    checkpoint (ref train.py:379-384, 504-540)."""
    config = load_config(tiny_config)
    log_dir = str(tmp_path / "runc")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer.fit(max_epochs=2)

    # reconstruct everything from the run dir alone
    assert os.path.exists(os.path.join(log_dir, "config.yaml"))
    config2 = load_config(os.path.join(log_dir, "config.yaml"))
    trainer2 = Trainer(config2, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    assert trainer2.start_epoch == 3

    # the checkpoint itself carries the config dict
    from encodec_tpu.train.checkpoint import load_checkpoint
    _, epoch, extra = load_checkpoint(os.path.join(log_dir, "model.ckpt"))
    assert extra["config"]["model"]["bins"] == 32
    assert epoch == 2


def test_all_experiment_configs_build(loaders):
    """Every shipped params/*.yaml parses and constructs a Trainer (model +
    discriminator + losses) — the reference experiment-matrix port."""
    import glob
    import encodec_tpu
    base = os.path.dirname(encodec_tpu.__file__)
    paths = sorted(glob.glob(os.path.join(base, "params", "*.yaml")))
    assert len(paths) >= 10
    from encodec_tpu.train.trainer import (Trainer, model_from_config,
                                           disc_from_config)
    for p in paths:
        config = load_config(p)
        # tiny overrides so construction stays cheap
        config.dataset.batch_size = 2
        model = model_from_config(config)
        assert model.cfg.rvq.bins == config.model.bins
        disc_cfg = disc_from_config(config)
        if config.model.train_discriminator:
            assert disc_cfg is not None
            assert len(disc_cfg.n_ffts) == len(config.model.disc_n_ffts)


def test_train_runner_builds_mesh_from_config(tmp_path, monkeypatch):
    """`python -m encodec_tpu.train` end-to-end: the runner reads
    `distributed.{data_parallel, seq_parallel}` and trains on a 2-D
    data x seq mesh (8 virtual devices) over synthetic npz data."""
    import sys
    rng = np.random.RandomState(0)
    d = tmp_path / "data" / "synth" / "thorax"
    d.mkdir(parents=True)
    for i in range(6):
        t = np.arange(900) / 10.0
        sig = np.sin(2 * np.pi * 0.3 * t) + 0.05 * rng.randn(900)
        np.savez(d / f"n{i}.npz", data=sig.astype(np.float32), fs=10)

    cfg = {
        "exp_details": {"name": "runner", "description": "test"},
        "common": {"log_interval": 1, "max_epoch": 1, "seed": 0,
                   "gradient_clipping": True},
        "dataset": {"root": str(tmp_path / "data"), "batch_size": 64,
                    "max_length": 600, "debug": True, "cv": 0,
                    "thorax": 1.0, "abdominal": 0.0,
                    "datasets": {"synth": 1.0}},
        "checkpoint": {"save_every": 1},
        "optimization": {"lr": 1e-3, "disc_lr": 1e-3},
        "loss": {"weight_l1": 1.0, "weight_l2": 0.0, "weight_commit": 0.0,
                 "weight_freq": 0.25, "weight_g": 0.0, "weight_feat": 0.0,
                 "alpha": 0.01, "bandwidth": None, "n_fft": 64,
                 "win_length": 64, "hop_length": 16,
                 "commit_start_epoch": 0},
        "lr_scheduler": {"warmup_epoch": 1},
        "model": {"ratios": [5, 2, 1], "bins": 32, "dimension": 16,
                  "target_bandwidths": [0.8], "train_discriminator": False,
                  "train_discriminator_start_epoch": 9,
                  "train_discriminator_prob": 0.0,
                  "disc_hop_lengths": [16], "disc_win_lengths": [64],
                  "disc_n_ffts": [64], "filters": 4,
                  "audio_normalize": False, "causal": True,
                  "norm": "layer_norm", "segment": "None",
                  "name": "my_encodec", "sample_rate": 10, "channels": 1},
        "distributed": {"data_parallel": True, "seq_parallel": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    log_dir = tmp_path / "run"

    from encodec_tpu.train.__main__ import main
    monkeypatch.setattr(sys, "argv", [
        "train", "--config", str(cfg_path), "--log_dir", str(log_dir)])
    main()
    assert os.path.exists(log_dir / "model.ckpt")
    assert os.path.exists(log_dir / "config.yaml")


def test_preemption_guard_signal_roundtrip():
    import os as _os
    import signal as _signal
    from encodec_tpu.train.preemption import PreemptionGuard
    prev = _signal.getsignal(_signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        _os.kill(_os.getpid(), _signal.SIGTERM)  # delivered synchronously
        assert guard.requested
    # original handler restored on exit
    assert _signal.getsignal(_signal.SIGTERM) is prev


def test_fit_preempted_checkpoints_and_resumes(tiny_config, loaders,
                                               tmp_path):
    """A preemption request mid-run checkpoints at the step boundary and
    stops; resume re-runs the interrupted epoch."""
    from encodec_tpu.train.preemption import PreemptionGuard
    config = load_config(tiny_config)
    log_dir = str(tmp_path / "run_preempt")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    guard = PreemptionGuard()
    epochs_seen = []

    def on_epoch(e, m):
        epochs_seen.append(e)
        if e == 1:
            guard.request()  # preempt after epoch 1 completes

    trainer.fit(max_epochs=5, on_epoch=on_epoch, preemption=guard)
    assert epochs_seen == [1]          # epoch 2 was cut short, no callback
    assert os.path.exists(os.path.join(log_dir, "model.ckpt"))
    trainer2 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    assert trainer2.start_epoch == 2   # re-runs the interrupted epoch


def test_sample_bandwidths_training(tiny_config, loaders, tmp_path):
    """model.sample_bandwidths draws a target bandwidth per step and runs
    the matching compiled step (upstream-style multi-bandwidth training;
    stages beyond the drawn n_q keep their state that step)."""
    import yaml as _yaml
    cfg_d = _yaml.safe_load(open(tiny_config))
    cfg_d["model"]["target_bandwidths"] = [0.01, 0.8]
    cfg_d["model"]["sample_bandwidths"] = True
    p = tmp_path / "cfg_mb.yaml"
    p.write_text(_yaml.dump(cfg_d))
    config = load_config(str(p))
    trainer = Trainer(config, loaders[0], loaders[1],
                      str(tmp_path / "run_mb"))
    assert trainer.sample_bandwidths
    assert len(trainer._bandwidth_nqs) == 2
    trainer.fit(max_epochs=1)
    # with seed 0 both bandwidths get drawn within an epoch, so the
    # non-full n_q step was compiled and used
    assert len(trainer._steps_by_nq) >= 1


def test_checkpoint_atomic_versioned_fallback(tmp_path):
    """Durability contract of train/checkpoint.py: rotated `.prev`
    generation, format_version gating, and transparent fallback when the
    newest file is truncated (SIGKILL mid-save)."""
    from encodec_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint, load_checkpoint_with_fallback,
        previous_path, FORMAT_VERSION)

    path = tmp_path / "ck" / "model.ckpt"
    path.parent.mkdir()
    state1 = {"w": np.arange(4, dtype=np.float32)}
    state2 = {"w": np.arange(4, dtype=np.float32) * 2}
    save_checkpoint(state1, 1, path)
    save_checkpoint(state2, 2, path)

    # rotation: the older generation survives at .prev
    assert previous_path(path).exists()
    st, epoch, _ = load_checkpoint(path)
    assert epoch == 2
    np.testing.assert_array_equal(st["w"], state2["w"])
    st_prev, epoch_prev, _ = load_checkpoint(previous_path(path))
    assert epoch_prev == 1

    # version field is present and future versions are refused
    import json

    def reversion(src, dst, bump):
        with np.load(src, allow_pickle=False) as z:
            manifest = json.loads(bytes(z["__manifest__"]).decode())
            arrays = {k: z[k] for k in z.files if k != "__manifest__"}
        manifest["format_version"] += bump
        with open(dst, "wb") as fh:
            np.savez(fh, __manifest__=np.frombuffer(
                json.dumps(manifest).encode(), np.uint8), **arrays)

    with np.load(path, allow_pickle=False) as z:
        assert json.loads(bytes(z["__manifest__"]).decode())[
            "format_version"] == FORMAT_VERSION
    future = tmp_path / "ck" / "future.ckpt"
    reversion(path, future, bump=1)
    with pytest.raises(ValueError, match="format_version"):
        load_checkpoint(future)
    # ... and the refusal must survive the fallback path even when a
    # loadable .prev exists: resuming the stale generation would rotate
    # the newer build's checkpoint out of existence two saves later
    reversion(path, future.with_suffix(".ckpt.prev"), bump=0)
    with pytest.raises(ValueError, match="format_version"):
        load_checkpoint_with_fallback(future)

    # v1 pickle files are refused loudly with a migration note — loading
    # a checkpoint can no longer execute code
    import pickle as _pickle
    legacy = tmp_path / "ck" / "legacy.ckpt"
    legacy.write_bytes(_pickle.dumps({"format_version": 1, "epoch": 1,
                                      "state": state1, "extra": {}}))
    with pytest.raises(ValueError, match="pickle"):
        load_checkpoint(legacy)

    # truncate the newest file (simulated kill mid-write on a non-atomic
    # fs) -> fallback loads the previous generation
    data = path.read_bytes()
    path.write_bytes(data[: len(data) // 2])
    st, epoch, _ = load_checkpoint_with_fallback(path)
    assert epoch == 1
    np.testing.assert_array_equal(st["w"], state1["w"])

    # no .prev and corrupt newest -> raises
    path2 = tmp_path / "ck" / "solo.ckpt"
    save_checkpoint(state1, 1, path2)
    data = path2.read_bytes()
    path2.write_bytes(data[: len(data) // 2])
    with pytest.raises(Exception):
        load_checkpoint_with_fallback(path2)


def test_trainer_resume_survives_truncated_checkpoint(tiny_config, loaders,
                                                      tmp_path):
    """Trainer.resume falls back to model.ckpt.prev when the last save was
    truncated, losing one save interval instead of the whole run."""
    config = load_config(tiny_config)
    log_dir = str(tmp_path / "run_trunc")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer.fit(max_epochs=3)  # save_every=2 -> saves at epochs 1 and 3
    ckpt = os.path.join(log_dir, "model.ckpt")
    assert os.path.exists(ckpt) and os.path.exists(ckpt + ".prev")
    data = open(ckpt, "rb").read()
    with open(ckpt, "wb") as fh:
        fh.write(data[: len(data) // 3])
    trainer2 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    assert trainer2.start_epoch == 2  # .prev held epoch 1

    # a kill between save_checkpoint's two renames leaves NO model.ckpt
    # but an intact .prev — resume must use it, not restart from scratch
    os.remove(ckpt)
    trainer3 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer3.resume()
    assert trainer3.start_epoch == 2


def test_async_checkpointer_snapshot_isolation(tmp_path):
    """AsyncCheckpointer snapshots on device BEFORE handing off: mutating
    (or donating) the live state after save() cannot affect the written
    file, and wait() surfaces writer errors."""
    import jax
    import jax.numpy as jnp
    from encodec_tpu.train.checkpoint import (AsyncCheckpointer,
                                              load_checkpoint)

    ck = AsyncCheckpointer()
    path = tmp_path / "async.ckpt"
    state = {"w": jnp.arange(8, dtype=jnp.float32)}
    ck.save(state, 1, path)
    # overwrite the live buffers immediately (simulates donation reuse)
    state = jax.jit(lambda s: jax.tree.map(lambda x: x * 0 - 1, s),
                    donate_argnums=0)(state)
    ck.wait()
    st, epoch, _ = load_checkpoint(path)
    np.testing.assert_array_equal(st["w"], np.arange(8, dtype=np.float32))
    assert epoch == 1

    # writer errors surface on wait()
    ck.save({"w": jnp.zeros(2)}, 2, tmp_path / "nodir" / "x.ckpt")
    with pytest.raises(Exception):
        ck.wait()


def test_trainer_async_save_roundtrip(tiny_config, loaders, tmp_path):
    """checkpoint.async_save trains + checkpoints + resumes identically."""
    cfg_d = yaml.safe_load(open(tiny_config))
    cfg_d["checkpoint"]["async_save"] = True
    p = tmp_path / "cfg_async.yaml"
    p.write_text(yaml.dump(cfg_d))
    config = load_config(str(p))
    log_dir = str(tmp_path / "run_async")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer.fit(max_epochs=3)
    assert os.path.exists(os.path.join(log_dir, "model.ckpt"))
    trainer2 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    assert trainer2.start_epoch == 4
    import jax
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_run_to_reference_checkpoint(tiny_config, loaders, tmp_path):
    """tools.export: a finished run dir exports to a zoo-style .th that
    reloads with the trained (post-fit) weights — the CLI face of the
    bidirectional interchange."""
    from encodec_tpu.tools.export import export_run
    from encodec_tpu.models.torch_zoo import load_pretrained
    import numpy as np

    config = load_config(tiny_config)
    log_dir = str(tmp_path / "run_export")
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer.fit(max_epochs=2)
    path = export_run(log_dir)
    assert os.path.basename(path).startswith(config.model.name + "-")

    model2 = trainer.model  # same architecture object; reload into it
    load_pretrained(model2, os.path.basename(path),
                    repository=os.path.dirname(path))
    np.testing.assert_array_equal(
        np.asarray(model2.qstate.embed),
        np.asarray(trainer.state.qstate.embed[:model2.qstate.embed.shape[0]]))
