"""Export a training run to a reference-format `.th` checkpoint.

Bridges the frameworks from the command line: point it at a run directory
(the trainer's `log_dir`, containing the snapshotted `config.yaml` and
`model.ckpt`) and it writes a zoo-style `.th` (sha256 prefix embedded in
the filename) that

- reloads here via `torch_zoo.load_pretrained` bit-identically, and
- loads into the reference's own torch modules via plain
  `load_state_dict` (ref model.py:331-342 naming convention).

    python -m encodec_tpu.tools.export RUN_DIR [--out DIR] [--name NAME]

The reference has no equivalent (its checkpoints ARE torch-native); this
closes the reverse direction for models trained on TPU.
"""

from __future__ import annotations

import argparse
import os


def export_run(run_dir: str, out_dir: str | None = None,
               name: str | None = None) -> str:
    """Load `run_dir`'s config + newest loadable checkpoint generation and
    write the reference-format `.th`. Returns the written path."""
    from ..train.config import load_config
    from ..train.trainer import model_from_config
    from ..train.checkpoint import load_checkpoint_with_fallback
    from ..models.torch_zoo import save_reference_checkpoint

    config = load_config(os.path.join(run_dir, "config.yaml"))
    model = model_from_config(config)
    raw, epoch, _ = load_checkpoint_with_fallback(
        os.path.join(run_dir, "model.ckpt"))
    # TrainState layout: (params, qstate, ...) — train/steps.py
    model.params, model.qstate = raw[0], raw[1]
    path = save_reference_checkpoint(model, out_dir or run_dir,
                                     name=name or model.name)
    print(f"exported epoch-{epoch} weights -> {path}")
    return path


def main() -> None:
    # exporting weights needs no accelerator
    from ..utils import honor_platform_env
    honor_platform_env()
    parser = argparse.ArgumentParser(
        description="Export a training run as a reference-format .th")
    parser.add_argument("run_dir", help="trainer log_dir with config.yaml "
                                        "and model.ckpt")
    parser.add_argument("--out", default=None,
                        help="output directory (default: run_dir)")
    parser.add_argument("--name", default=None,
                        help="checkpoint base name (default: model name)")
    args = parser.parse_args()
    export_run(args.run_dir, args.out, args.name)


if __name__ == "__main__":
    main()
