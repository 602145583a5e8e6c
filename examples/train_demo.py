"""Self-contained training demo: synthetic breathing data → GAN training →
preemption → resume. No dataset or checkpoints needed.

Mirrors the reference's `python encodec/train.py --exp_name ...` workflow
(ref train.py:551-653) at toy scale: builds a few synthetic "nights",
trains the codec + MS-STFT discriminator for two epochs, simulates a
preemption (the SIGTERM path), and resumes from the atomic checkpoint.

Run: python examples/train_demo.py [--epochs 3] [--log-dir /tmp/run]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodec_tpu.utils import honor_platform_env
honor_platform_env()



def make_synthetic_nights(root: str, n: int = 6, seconds: int = 90,
                          fs: int = 10) -> None:
    d = os.path.join(root, "synth", "thorax")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    t = np.arange(seconds * fs) / fs
    for i in range(n):
        rate = 0.2 + 0.1 * rng.rand()          # breaths/s
        sig = (np.sin(2 * np.pi * rate * t)
               + 0.05 * rng.randn(t.size)).astype(np.float32)
        np.savez(os.path.join(d, f"night{i}.npz"), data=sig, fs=fs)


def main():
    parser = argparse.ArgumentParser("train_demo")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--log-dir", default=None)
    args = parser.parse_args()

    import yaml
    from encodec_tpu.data import BreathingDataset, MergedDataset, DataLoader
    from encodec_tpu.train.config import load_config
    from encodec_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="encodec_tpu_demo_")
    data_root = os.path.join(tmp, "data")
    make_synthetic_nights(data_root)
    log_dir = args.log_dir or os.path.join(tmp, "run")

    cfg = {
        "exp_details": {"name": "demo", "description": "synthetic demo"},
        "common": {"log_interval": 1, "max_epoch": args.epochs, "seed": 0,
                   "gradient_clipping": True},
        "dataset": {"root": None, "batch_size": 2, "max_length": 600,
                    "debug": True, "cv": 0},
        "checkpoint": {"save_every": 1, "async_save": True},
        "optimization": {"lr": 1e-3, "disc_lr": 1e-3},
        "loss": {"weight_l1": 1.0, "weight_l2": 0.0, "weight_commit": 0.25,
                 "weight_freq": 0.25, "weight_g": 3.0, "weight_feat": 3.0,
                 "alpha": 0.01, "bandwidth": None, "n_fft": 64,
                 "win_length": 64, "hop_length": 16,
                 "commit_start_epoch": 1},
        "lr_scheduler": {"warmup_epoch": 1},
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
    cfg_path = os.path.join(tmp, "cfg.yaml")
    with open(cfg_path, "w") as fh:
        yaml.dump(cfg, fh)

    rng = np.random.RandomState(1)
    tr = BreathingDataset(data_root, "synth", mode="train", max_length=600,
                          rng=rng)
    va = BreathingDataset(data_root, "synth", mode="val", max_length=600,
                          rng=rng)
    m_tr = MergedDataset([tr], [1.0], sfreq=0.008, debug=True, rng=rng)
    m_va = MergedDataset([va], [1.0], sfreq=0.004, debug=True, rng=rng)
    loaders = (DataLoader(m_tr, 2, seed=0), DataLoader(m_va, 2, seed=0))

    config = load_config(cfg_path)
    trainer = Trainer(config, loaders[0], loaders[1], log_dir)

    # --- train, simulating a preemption after the first epoch -------------
    from encodec_tpu.train.preemption import PreemptionGuard
    guard = PreemptionGuard()

    def on_epoch(epoch, metrics):
        print(f"epoch {epoch}: loss={metrics.get('Loss', float('nan')):.4f}")
        if epoch == 1 and args.epochs > 1:
            print("-> simulating preemption (SIGTERM)")
            guard.request()

    trainer.fit(max_epochs=args.epochs, on_epoch=on_epoch, preemption=guard)
    print(f"checkpointed to {log_dir}/model.ckpt")

    # --- resume in a fresh Trainer (what a restarted job does) ------------
    trainer2 = Trainer(config, loaders[0], loaders[1], log_dir)
    trainer2.resume()
    print(f"resumed at epoch {trainer2.start_epoch}")
    trainer2.fit(max_epochs=args.epochs,
                 on_epoch=lambda e, m: print(
                     f"epoch {e}: loss={m.get('Loss', float('nan')):.4f}"))
    out = trainer2.evaluate(args.epochs, save_figure=False)
    print(f"final val: Loss={out['Loss']:.4f} "
          f"entropy={out.get('code_entropy_mean', float('nan')):.2f}")
    print("DEMO OK")


if __name__ == "__main__":
    main()
