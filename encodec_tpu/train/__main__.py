"""Training entry point: `python -m encodec_tpu.train --config path.yaml`.

Mirrors the reference `python encodec/train.py --exp_name ...` runner
(train.py:551-653): loads/snapshots the YAML config, builds the breathing
datasets and the model, and runs the epoch loop with checkpoint/resume.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def build_dataloaders(config):
    from ..data import BreathingDataset, MergedDataset, DataLoader
    import numpy as np

    root = config.dataset.root
    if root is None:
        raise SystemExit("dataset.root must point at the npz data directory")
    channels = {}
    if getattr(config.dataset, "thorax", 0) > 0:
        channels["thorax"] = config.dataset.thorax
    if getattr(config.dataset, "abdominal", 0) > 0:
        channels["abdominal"] = config.dataset.abdominal

    weights = config.dataset.datasets.__dict__ \
        if hasattr(config.dataset.datasets, "__dict__") else config.dataset.datasets
    train_sets, val_sets, weight_list = [], [], []
    rng = np.random.RandomState(config.common.seed)
    for name, w in weights.items():
        if w <= 0:
            continue
        kw = dict(root=root, dataset=name, cv=config.dataset.cv,
                  channels=channels, max_length=config.dataset.max_length,
                  rng=rng)
        train_sets.append(BreathingDataset(mode="train", **kw))
        val_sets.append(BreathingDataset(mode="val", **kw))
        weight_list.append(w)
    train_ds = MergedDataset(train_sets, weight_list, 1.0,
                             debug=config.dataset.debug, rng=rng)
    val_ds = MergedDataset(val_sets, weight_list, 0.2,
                           debug=config.dataset.debug, rng=rng)
    mapping = train_ds.mapping
    bs = config.dataset.batch_size
    workers = int(getattr(config.dataset, "num_workers", 0) or 0)
    # eval sees every item (torch DataLoader's drop_last=False default):
    # the ragged tail batch costs one extra eval_step compile but a val
    # set smaller than one batch still evaluates. Under a device mesh the
    # batch axis must divide the mesh, so there the tail is dropped.
    dist = getattr(config, "distributed", None)
    uses_mesh = bool(getattr(dist, "data_parallel", False)
                     or getattr(dist, "seq_parallel", 0))
    return (DataLoader(train_ds, bs, shuffle=True, seed=config.common.seed,
                       num_workers=workers),
            DataLoader(val_ds, bs, shuffle=False, seed=config.common.seed,
                       num_workers=workers, drop_last=uses_mesh),
            mapping)


def main():
    from ..utils import honor_platform_env
    honor_platform_env()
    parser = argparse.ArgumentParser("encodec_tpu.train")
    parser.add_argument("--config", type=str, required=True,
                        help="YAML experiment config")
    parser.add_argument("--log_dir", type=str, default=None)
    parser.add_argument("--resume_from", type=str, default=None,
                        help="run directory with config.yaml + model.ckpt")
    parser.add_argument("--max_epochs", type=int, default=None)
    args = parser.parse_args()

    from .config import load_config
    from .trainer import Trainer

    if args.resume_from and os.path.exists(args.resume_from):
        log_dir = args.resume_from
        config = load_config(os.path.join(log_dir, "config.yaml"))
        resume = True
    else:
        stamp = datetime.now().strftime("%Y%m%d/%H%M%S")
        log_dir = args.log_dir or os.path.join("runs", stamp)
        config = load_config(args.config, log_dir)
        resume = False

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(log_dir=log_dir)
    except Exception:
        pass

    # distributed: `data_parallel: true` shards the batch over every local
    # device (the reference's nn.DataParallel, train.py:630-632, done as a
    # Mesh); `seq_parallel: N` additionally shards TIME over a 2-D
    # data x seq mesh for long-signal GAN phases. On TPU pods
    # `initialize_multihost` brings up jax.distributed first (multi-host
    # batch feeding needs per-process shard loading — single-host
    # multi-device is the fully-wired path here).
    mesh = None
    dist = getattr(config, "distributed", None)
    if dist is not None and getattr(dist, "data_parallel", False):
        import jax
        from ..parallel import initialize_multihost, make_mesh, make_mesh_2d
        initialize_multihost()
        n = len(jax.devices())
        seq = int(getattr(dist, "seq_parallel", 1) or 1)
        if seq > 1:
            assert n % seq == 0, (n, seq)
            mesh = make_mesh_2d(n // seq, seq)
        elif n > 1:
            mesh = make_mesh(n)

    train_loader, val_loader, mapping = build_dataloaders(config)
    trainer = Trainer(config, train_loader, val_loader, log_dir,
                      label_mapping=mapping, writer=writer, mesh=mesh)
    if resume:
        trainer.resume()
    trainer.fit(max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
