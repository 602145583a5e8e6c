"""Experiment runner: config → data → model → epoch loop.

Behavioral reference: encodec/train.py:551-653 (main) and 39-353
(train_one_step / test): per-epoch generator steps, coin-flip discriminator
steps after a start epoch, commit loss gated by `commit_start_epoch`,
LinearWarmupCosineAnnealing per epoch, periodic eval + checkpoint,
TensorBoard scalars, per-codebook code histograms and entropy curves.

The heavy lifting happens in the jitted steps (train/steps.py); this module
is the host-side loop: schedule weights per epoch (traced, so no
recompiles), stream batches, accumulate metrics, checkpoint/resume.
"""

from __future__ import annotations

import logging
import os
import random
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.balancer import Balancer
from ..models.model import build_model, EncodecModel
from ..quant import num_quantizers_for_bandwidth
from ..models.msstftd import MSSTFTConfig
from ..train.config import ConfigNamespace, parse_segment
from ..train.checkpoint import (save_checkpoint,
                                load_checkpoint_with_fallback)
from ..train.metrics import Metrics
from ..train.schedulers import linear_warmup_cosine
from ..train.steps import (LossWeights, TrainState, create_train_state,
                           make_train_steps)


def model_from_config(config: ConfigNamespace) -> EncodecModel:
    """Build the generator from an experiment config (ref init_model)."""
    import dataclasses
    m = config.model
    model = build_model(
        list(m.target_bandwidths), sample_rate=m.sample_rate,
        channels=m.channels, causal=m.causal, model_norm=m.norm,
        audio_normalize=m.audio_normalize, segment=parse_segment(m.segment),
        name=m.name, ratios=list(m.ratios), bins=m.bins,
        dimension=getattr(m, "dimension", 128),
        n_filters=getattr(m, "filters", 32),
        decoder_final_norm="none",       # fork behavior (seanet.py:228)
        shared_codebook=True,            # fork behavior (core_vq.py:374)
    )
    if getattr(m, "remat", False):
        seanet = dataclasses.replace(model.cfg.seanet, remat=True)
        model.cfg = dataclasses.replace(model.cfg, seanet=seanet)
    return model


def disc_from_config(config: ConfigNamespace) -> tp.Optional[MSSTFTConfig]:
    m = config.model
    if not m.train_discriminator:
        return None
    return MSSTFTConfig(
        filters=m.filters, in_channels=m.channels, out_channels=m.channels,
        n_ffts=tuple(m.disc_n_ffts), hop_lengths=tuple(m.disc_hop_lengths),
        win_lengths=tuple(m.disc_win_lengths),
        conv_impl=str(getattr(m, "disc_conv_impl", "xla")),
        time_chunk=getattr(m, "disc_time_chunk", None))


class Trainer:
    def __init__(self, config: ConfigNamespace, train_loader, val_loader,
                 log_dir: str, label_mapping: tp.Optional[dict] = None,
                 mesh=None, writer=None):
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.log_dir = log_dir
        self.label_mapping = label_mapping or {}
        os.makedirs(log_dir, exist_ok=True)

        self.model = model_from_config(config)
        self.disc_cfg = disc_from_config(config)
        # Optional gradient balancer (the reference config-stubs this but
        # never wires it — params/config.yaml:79-84; here it's functional).
        self.balancer = None
        bal_cfg = getattr(config, "balancer", None)
        if bal_cfg is not None and getattr(bal_cfg, "weights", None):
            weights = bal_cfg.weights
            weights = weights.__dict__ if hasattr(weights, "__dict__") else weights
            self.balancer = Balancer(weights={k: float(v)
                                              for k, v in weights.items()})
        self.state, _, _ = create_train_state(
            self.model, self.disc_cfg, seed=config.common.seed,
            clip=0.1 if config.common.gradient_clipping else None,
            balancer=self.balancer)
        loss_cfg = config.loss
        freq_kwargs = dict(alpha=loss_cfg.alpha, bandwidth=loss_cfg.bandwidth,
                           sampling_rate=10, n_fft=loss_cfg.n_fft)
        if getattr(loss_cfg, "win_length", None):
            freq_kwargs["win_length"] = loss_cfg.win_length
        if getattr(loss_cfg, "hop_length", None):
            freq_kwargs["hop_length"] = loss_cfg.hop_length
        # mixed precision: `common.compute_dtype: bfloat16` runs the conv
        # trunks in bf16 with f32 master weights (see train/steps.py)
        compute_dtype = None
        dtype_name = getattr(config.common, "compute_dtype", None)
        if dtype_name and str(dtype_name) not in ("float32", "f32"):
            compute_dtype = jnp.dtype(str(dtype_name)).type
        if getattr(config.common, "disc_remat", False) and \
                self.disc_cfg is not None and self.disc_cfg.time_chunk:
            logging.warning(
                "common.disc_remat is ignored: model.disc_time_chunk=%d "
                "supersedes it (the chunk scan already rematerializes)",
                self.disc_cfg.time_chunk)
        def _make_steps(n_q=None):
            return make_train_steps(
                self.model.cfg, self.disc_cfg, freq_loss_kwargs=freq_kwargs,
                mesh=mesh, balancer=self.balancer,
                clip=0.1 if config.common.gradient_clipping else None,
                compute_dtype=compute_dtype, n_q=n_q,
                # `common.disc_remat: true` rematerializes each STFT
                # resolution's GAN terms (train/steps.py) — lets the full
                # GAN step fit one chip at 4 h x batch 8 production shapes.
                disc_remat=bool(getattr(config.common, "disc_remat", False)),
                # the trainer's loop always consumes the state it passes in
                # (`self.state, m = step(self.state, ...)`), so donating
                # its buffers into the update is safe and halves their
                # footprint.
                donate=True)

        (self.gen_step, self.disc_step, self.eval_step,
         self.balanced_gen_step) = _make_steps()
        # `model.sample_bandwidths: true` — upstream-EnCodec-style
        # multi-bandwidth training (the published checkpoints serve
        # 1.5-24 kbps because a target bandwidth was sampled uniformly per
        # batch; the fork trains one fixed bandwidth, so this is opt-in).
        # Each distinct n_q is its own compiled step, cached on first use —
        # identical semantics to rvq_forward(n_q=k): stages >= k keep
        # their state and receive no gradient that step.
        self.sample_bandwidths = bool(
            getattr(config.model, "sample_bandwidths", False))
        self._steps_by_nq: tp.Dict[int, tuple] = {}
        self._bandwidth_nqs = sorted({
            num_quantizers_for_bandwidth(
                self.model.cfg.rvq, self.model.frame_rate, bw)
            for bw in self.model.cfg.target_bandwidths})

        def steps_for(n_q):
            """(gen_step, disc_step, balanced_gen_step) compiled at `n_q` —
            including the balanced generator step, so multi-bandwidth
            training composes with `loss.use_balancer` instead of silently
            degenerating to fixed full-n_q balanced steps."""
            if n_q is None or n_q == self.model.cfg.rvq.n_q:
                return (self.gen_step, self.disc_step, self.balanced_gen_step)
            if n_q not in self._steps_by_nq:
                gen, disc, _, balanced = _make_steps(n_q)
                self._steps_by_nq[n_q] = (gen, disc, balanced)
            return self._steps_by_nq[n_q]

        self._steps_for = steps_for
        self.use_balancer = bool(self.balancer) and \
            bool(getattr(loss_cfg, "use_balancer", False))
        self.metrics = Metrics()
        self.writer = writer
        self.start_epoch = 1
        self._async_ckpt = None  # built lazily when checkpoint.async_save
        random.seed(config.common.seed)
        # snapshot the experiment config into the run dir for self-contained
        # resume (ref train.py:379-384); load_config(path, log_dir) does the
        # same when the run is launched via __main__.
        cfg_path = os.path.join(self.log_dir, "config.yaml")
        if not os.path.exists(cfg_path):
            try:
                import yaml
                from .config import config_to_dict
                os.makedirs(self.log_dir, exist_ok=True)
                with open(cfg_path, "w") as fh:
                    yaml.dump(config_to_dict(config), fh)
            except Exception:
                logging.getLogger(__name__).warning(
                    "could not snapshot config.yaml into %s", self.log_dir,
                    exc_info=True)

    # -- schedule ---------------------------------------------------------
    def weights_for_epoch(self, epoch: int) -> LossWeights:
        c = self.config
        lr = linear_warmup_cosine(epoch - 1, float(c.optimization.lr),
                                  c.lr_scheduler.warmup_epoch,
                                  c.common.max_epoch)
        disc_start = getattr(c.model, "train_discriminator_start_epoch", 0)
        disc_lr = linear_warmup_cosine(
            max(0, epoch - 1 - disc_start), float(c.optimization.disc_lr),
            c.lr_scheduler.warmup_epoch, c.common.max_epoch - disc_start)
        commit_on = epoch >= getattr(c.loss, "commit_start_epoch", 0)
        return LossWeights.make(
            l1=c.loss.weight_l1, l2=c.loss.weight_l2, freq=c.loss.weight_freq,
            commit=c.loss.weight_commit if commit_on else 0.0,
            codebook=1.0 if commit_on else 0.0,
            gen=c.loss.weight_g, feat=c.loss.weight_feat,
            lr=lr, disc_lr=disc_lr)

    def _gan_active(self, epoch: int) -> bool:
        c = self.config.model
        return bool(c.train_discriminator) and \
            epoch >= c.train_discriminator_start_epoch

    # -- loops ------------------------------------------------------------
    def train_one_epoch(self, epoch: int, guard=None) -> dict:
        weights = self.weights_for_epoch(epoch)
        gan = self._gan_active(epoch)
        prob = float(getattr(self.config.model, "train_discriminator_prob", 0.5))
        log_this = epoch % self.config.common.log_interval == 0
        for batch, ds_ids in self.train_loader:
            if guard is not None and guard.requested:
                break  # stop at a step boundary; fit checkpoints
            x = jnp.asarray(batch["x"])
            train_disc = gan and random.random() < prob
            if self.sample_bandwidths:
                n_q_step = random.choice(self._bandwidth_nqs)
                gen_step, disc_step, balanced_step = self._steps_for(n_q_step)
            else:
                gen_step, disc_step, balanced_step = (
                    self.gen_step, self.disc_step, self.balanced_gen_step)
            if self.use_balancer and not (gan and not train_disc):
                self.state, m = balanced_step(self.state, x, weights)
            else:
                self.state, m = gen_step(
                    self.state, x, weights, use_gan=gan and not train_disc)
            if train_disc:
                self.state, dm = disc_step(self.state, x, weights)
                if log_this:
                    self.metrics.fill_metrics(
                        {"Loss Discriminator": dm["loss_disc"],
                         "Logits Real": dm["logits_real"],
                         "Logits Fake": dm["logits_fake"]})
            if log_this:
                self.metrics.fill_metrics({
                    "Loss": m["loss"], "Loss L1": m["loss_l1"],
                    "Loss L2": m["loss_l2"],
                    "Loss Frequency": m["loss_freq"],
                    "Loss commit_loss": m["loss_commit"],
                    "Frequency Accuracy": m["freq_acc"],
                    "Max Gradient": m["grad_norm"],
                })
        out = {}
        if log_this:
            out = self.metrics.compute_and_log_metrics()
            out["Learning Rate"] = float(weights.lr)
            self._log(out, "train", epoch)
            self.metrics.clear_metrics()
        return out

    def evaluate(self, epoch: int, save_figure: bool = True) -> dict:
        weights = self.weights_for_epoch(epoch)
        all_codes = []
        first = True
        n_batches = 0
        for batch, ds_ids in self.val_loader:
            n_batches += 1
            x = jnp.asarray(batch["x"])
            m, codes, x_hat = self.eval_step(self.state, x, weights)
            all_codes.append(np.asarray(codes))
            self.metrics.fill_metrics({
                "Loss": m["loss"], "Loss L1": m["loss_l1"],
                "Loss L2": m["loss_l2"], "Loss Frequency": m["loss_freq"],
                "Frequency Accuracy": m["freq_acc"],
            })
            # per-dataset per-item losses (ref train.py:258-261)
            for j, d_id in enumerate(np.asarray(ds_ids)):
                name = self.label_mapping.get(int(d_id), str(int(d_id)))
                self.metrics.fill_metrics({
                    f"Loss L1 {name}": m["l_t"][j],
                    f"Loss L2 {name}": m["l_t_2"][j],
                })
            if first and save_figure and self.model.cfg.channels == 1:
                # reconstruction + spectrogram panel (ref train.py:290-313)
                try:
                    from ..tools.visualize import reconstruction_figure
                    fl = self.config.loss
                    reconstruction_figure(
                        np.asarray(x)[0, :, 0], np.asarray(x_hat)[0, :, 0],
                        sampling_rate=10, n_fft=fl.n_fft,
                        win_length=getattr(fl, "win_length", None),
                        hop_length=getattr(fl, "hop_length", None),
                        path=os.path.join(self.log_dir, f"{epoch}.png"))
                except Exception:
                    logging.getLogger(__name__).warning(
                        "reconstruction figure for epoch %d failed",
                        epoch, exc_info=True)
                first = False
        if n_batches == 0:
            logging.warning(
                "evaluate(epoch=%d): validation loader yielded no batches "
                "(dataset smaller than batch_size with drop_last?) — no "
                "val metrics or figures this epoch", epoch)
        out = self.metrics.compute_and_log_metrics()
        self.metrics.clear_metrics()
        if all_codes:
            out.update(self.code_stats(np.concatenate(all_codes, axis=0)))
        self._log({k: v for k, v in out.items()
                   if isinstance(v, (int, float))}, "val", epoch)
        return out

    def code_stats(self, codes: np.ndarray) -> dict:
        """Per-codebook empirical entropy (ref train.py:325-343)."""
        # codes: [N, K, T]
        stats = {}
        K = codes.shape[1]
        bins = self.model.cfg.rvq.bins
        entropies = []
        for k in range(K):
            counts = np.bincount(codes[:, k].reshape(-1), minlength=bins)
            p = counts / max(1, counts.sum())
            nz = p[p > 0]
            entropies.append(float(-(nz * np.log2(nz)).sum()))
        stats["code_entropy"] = entropies
        stats["code_entropy_mean"] = float(np.mean(entropies))
        return stats

    # -- logging / checkpointing ------------------------------------------
    def _log(self, metrics: dict, phase: str, epoch: int) -> None:
        if self.writer is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self.writer.add_scalar(f"{phase}/{k}", v, epoch)
            self.writer.flush()

    def save(self, epoch: int) -> None:
        """Checkpoint the full train state; the config rides along (and is
        snapshotted as config.yaml in the run dir) so a run directory is
        self-contained for resume (ref train.py:379-384, 504-522).

        `checkpoint.async_save: true` overlaps the device->host transfer
        and disk write with training (on-device snapshot first, so the
        donated state buffers cannot race the writer)."""
        from .config import config_to_dict
        path = os.path.join(self.log_dir, "model.ckpt")
        extra = {"config": config_to_dict(self.config)}
        if getattr(self.config.checkpoint, "async_save", False):
            if self._async_ckpt is None:
                from .checkpoint import AsyncCheckpointer
                self._async_ckpt = AsyncCheckpointer()
            self._async_ckpt.save(self.state, epoch, path, extra=extra)
        else:
            save_checkpoint(self.state, epoch, path, extra=extra)

    def wait_for_checkpoint(self) -> None:
        """Block until any in-flight async checkpoint write completes."""
        if self._async_ckpt is not None:
            self._async_ckpt.wait()

    def resume(self, path: tp.Optional[str] = None) -> None:
        self.wait_for_checkpoint()
        path = path or os.path.join(self.log_dir, "model.ckpt")
        from .checkpoint import previous_path
        if os.path.exists(path) or os.path.exists(previous_path(path)):
            # falls back to model.ckpt.prev when the newest save is
            # truncated OR missing (a kill mid-save can land between the
            # rotation and the final rename, leaving only .prev) — resume
            # then loses one save interval instead of the whole run
            raw, epoch, _ = load_checkpoint_with_fallback(
                path, target=self.state)
            self.state = jax.tree.map(jnp.asarray, TrainState(*raw))
            self.start_epoch = epoch + 1

    def fit(self, max_epochs: tp.Optional[int] = None,
            on_epoch: tp.Optional[tp.Callable[[int, dict], None]] = None,
            preemption: tp.Optional["PreemptionGuard"] = None):
        """Epoch loop with periodic eval/checkpoint and graceful-preemption
        handling: pass a `train.preemption.PreemptionGuard` (or rely on the
        default, installed for SIGTERM) and a preempted run checkpoints at
        the next step boundary before returning, so a restart with the
        same run dir resumes losing at most the interrupted epoch."""
        from .preemption import PreemptionGuard
        max_epochs = max_epochs or self.config.common.max_epoch
        save_every = self.config.checkpoint.save_every
        guard = preemption if preemption is not None else PreemptionGuard()
        with guard:
            for epoch in range(self.start_epoch, max_epochs + 1):
                t0 = time.time()
                metrics = self.train_one_epoch(epoch, guard=guard)
                if guard.requested:
                    # the epoch was cut short: label the checkpoint so
                    # resume re-runs it from its start (epoch-1 may be 0
                    # for a first-epoch preemption — resume then starts
                    # over at epoch 1, never skipping the interrupted one)
                    self.save(epoch - 1)
                    logging.warning(
                        "preemption requested: checkpointed mid-run at "
                        "epoch %d; resume re-runs this epoch", epoch)
                    break
                # `% == 1` is the reference's cadence (ref train.py:639,
                # first save at epoch 1); its quirk that save_every=1
                # would then NEVER fire is fixed, and the last epoch
                # always checkpoints
                if (epoch % save_every == 1 or save_every == 1
                        or epoch == max_epochs):
                    self.evaluate(epoch)
                    self.save(epoch)
                if on_epoch:
                    on_epoch(epoch, metrics)
        self.wait_for_checkpoint()
        return self.state
