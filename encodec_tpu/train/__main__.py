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
    return (DataLoader(train_ds, bs, shuffle=True, seed=config.common.seed,
                       num_workers=workers),
            DataLoader(val_ds, bs, shuffle=False, seed=config.common.seed,
                       num_workers=workers),
            mapping)


def main():
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

    train_loader, val_loader, mapping = build_dataloaders(config)
    trainer = Trainer(config, train_loader, val_loader, log_dir,
                      label_mapping=mapping, writer=writer)
    if resume:
        trainer.resume()
    trainer.fit(max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
