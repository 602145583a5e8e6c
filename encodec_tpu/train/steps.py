"""Jitted training steps: generator, discriminator, eval.

Behavioral reference: encodec/train.py:39-188 (train_one_step) — generator
loss = w_l1·L1 + w_freq·spectral + w_l2·L2 (+ w_commit·commit + codebook
after the commit start epoch) (+ w_g·l_g + w_feat·l_feat in the GAN phase),
Adam(β=0.8, 0.9) with global-norm clip 0.1, discriminator trained by coin
flip with the DAC LSGAN loss.

TPU-native structure: one pure function per step, jitted once per static
flag set (`use_gan`). Epoch-dependent weights are *traced* scalars
(`LossWeights`) so schedule changes never recompile. Under a `Mesh`, the
batch is sharded on the `data` axis while params / optimizer / EMA codebook
state are replicated; gradient all-reduce and the quantizer's global batch
statistics come out of XLA's partitioner — this replaces the reference's
`sync_grad`/`sync_buffer`/`broadcast_tensors` side channel entirely, and is
immune to the RVQ-buffer-vs-DDP hazard its README warns about (README:213).

The reference defines but never wires the gradient `Balancer`
(balancer.py, config-stubbed); here `use_balancer=True` activates it: the
balanced losses' gradients w.r.t. the decoded waveform are rescaled to equal
EMA norms and pulled back through the generator with one vjp.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import optax

from ..losses.balancer import Balancer, init_balancer_state, balance
from ..ops.conv import spectral_norm_update_tree
from ..losses.gan import total_loss, disc_loss
from ..losses.spectrogram import reconstruction_loss
from ..models.model import EncodecConfig, forward_train
from ..models.msstftd import (MSSTFTConfig, init_msstftd, msstftd_forward,
                              msstftd_gan_sums_chunked, msstftd_num_fmaps,
                              msstftd_sub_forward)
from ..quant import RVQState

Array = jnp.ndarray


class LossWeights(tp.NamedTuple):
    """Per-step (traced) loss weights & learning rates."""
    l1: Array
    l2: Array
    freq: Array
    commit: Array
    codebook: Array
    gen: Array
    feat: Array
    lr: Array
    disc_lr: Array

    @classmethod
    def make(cls, *, l1=1.0, l2=0.0, freq=1.0, commit=0.0, codebook=0.0,
             gen=3.0, feat=3.0, lr=1e-4, disc_lr=3e-4):
        return cls(*(jnp.asarray(v, jnp.float32) for v in
                     (l1, l2, freq, commit, codebook, gen, feat, lr, disc_lr)))


class TrainState(tp.NamedTuple):
    params: tp.Any
    qstate: RVQState
    opt_state: tp.Any
    disc_params: tp.Any
    disc_opt_state: tp.Any
    balancer_state: tp.Any
    rng: Array


def _make_optimizer(clip: tp.Optional[float] = 0.1):
    """Adam(0.8, 0.9) with global-norm clipping, lr injected per step."""
    def build(learning_rate):
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(clip))
        chain.append(optax.adam(learning_rate, b1=0.8, b2=0.9))
        return optax.chain(*chain)
    return optax.inject_hyperparams(build)(learning_rate=1e-4)


def create_train_state(model, disc_cfg: tp.Optional[MSSTFTConfig] = None,
                       seed: int = 0, clip: tp.Optional[float] = 0.1,
                       balancer: tp.Optional[Balancer] = None,
                       ) -> tp.Tuple[TrainState, tp.Any, tp.Any]:
    """Build (state, gen_optimizer, disc_optimizer) for an EncodecModel."""
    gen_opt = _make_optimizer(clip)
    disc_opt = _make_optimizer(clip)
    key = jax.random.PRNGKey(seed)
    dkey, rng = jax.random.split(key)
    disc_params = init_msstftd(dkey, disc_cfg) if disc_cfg else None
    state = TrainState(
        params=model.params,
        qstate=model.qstate,
        opt_state=gen_opt.init(model.params),
        disc_params=disc_params,
        disc_opt_state=disc_opt.init(disc_params) if disc_params else None,
        balancer_state=init_balancer_state(balancer) if balancer else None,
        rng=rng,
    )
    return state, gen_opt, disc_opt


def make_train_steps(model_cfg: EncodecConfig,
                     disc_cfg: tp.Optional[MSSTFTConfig] = None, *,
                     n_q: tp.Optional[int] = None,
                     freq_loss_kwargs: tp.Optional[dict] = None,
                     balancer: tp.Optional[Balancer] = None,
                     mesh=None, donate: bool = False,
                     clip: tp.Optional[float] = 0.1,
                     precision=None,
                     compute_dtype=None,
                     disc_remat: bool = False):
    """Build jitted (gen_step, disc_step, eval_step).

    gen_step(state, batch [B,T,C], weights, use_gan: static) →
        (new_state, metrics)
    disc_step(state, batch, weights) → (new_state, metrics)
    eval_step(state, batch, weights) → metrics

    `clip` must match the value used in `create_train_state` (it shapes the
    optimizer state pytree). `compute_dtype=jnp.bfloat16` runs the conv
    trunks in bf16 with f32 master weights/optimizer/losses (see
    `forward_train`); gradients come back f32 through the cast transpose.
    The MS-STFT discriminator follows the same dtype (bf16 conv stack and
    feature maps, f32 STFT/logits/loss accumulation) — halving its
    activation memory, which is what dominates GAN-phase HBM at long
    signal lengths.

    `donate=True` donates the input `TrainState`'s buffers to each update
    step (params/optimizer/EMA state update in place — halves their HBM
    footprint during the swap). The caller must then treat the passed-in
    state as consumed, as the Trainer does; keep the default for
    call-sites that reuse a state across step variants (tests, notebooks).

    `disc_remat=True` computes each STFT resolution's GAN terms inside a
    `jax.checkpoint` block (generator and discriminator steps): the
    sub-discriminator's conv activations and feature maps are recomputed in
    the backward instead of stored, so at most one resolution's activations
    are ever live. Loss values are identical (same math, same association
    order) — only the memory/recompute schedule changes.

    `disc_cfg.time_chunk=N` goes further: the discriminator runs as a
    `lax.scan` over N-frame time chunks with exact halo handling
    (`models.msstftd.msstftd_gan_sums_chunked`), making GAN activation
    memory O(chunk) regardless of signal length — the enabler for the FULL
    production GAN step (4 h x batch 8) on one chip, where even rematted
    whole-signal discriminator backwards exceed HBM (XLA pads 32-channel
    buffers 4x to the 128-lane tile). Supersedes `disc_remat`.
    """
    n_q = n_q or model_cfg.rvq.n_q
    fl_kwargs = dict(alpha=0.01, bandwidth=None, sampling_rate=10, n_fft=512)
    fl_kwargs.update(freq_loss_kwargs or {})
    gen_opt = _make_optimizer(clip)
    disc_opt = _make_optimizer(clip)

    def _freq_loss(x, x_hat):
        return reconstruction_loss(x[..., 0], x_hat[..., 0], **fl_kwargs)

    def _gan_terms_remat(disc_params, batch, x_hat):
        """(l_g, l_feat) with per-resolution rematerialization — equal to
        `total_loss` over `msstftd_forward` outputs, association order and
        normalization included, but never holding more than one
        sub-discriminator's activations."""
        subs = disc_params["discs"]
        l_g = jnp.zeros(())
        l_feat = jnp.zeros(())
        for i, sub in enumerate(subs):
            def one(sub, batch, x_hat, i=i):
                logits_fake, fmap_fake = msstftd_sub_forward(
                    sub, x_hat, disc_cfg, i, precision=precision,
                    compute_dtype=compute_dtype)
                _, fmap_real = msstftd_sub_forward(
                    sub, batch, disc_cfg, i, precision=precision,
                    compute_dtype=compute_dtype)
                lg = jnp.mean(jnp.square(1.0 - logits_fake))
                lf = jnp.zeros(())
                for fr, ff in zip(fmap_real, fmap_fake):
                    # f32 accumulation (fmaps may be bf16)
                    real = jax.lax.stop_gradient(fr)
                    lf = lf + (jnp.mean(jnp.abs(real - ff),
                                        dtype=jnp.float32)
                               / jnp.mean(jnp.abs(real), dtype=jnp.float32))
                return lg, lf
            lg, lf = jax.checkpoint(one)(sub, batch, x_hat)
            l_g = l_g + lg
            l_feat = l_feat + lf
        return (l_g / len(subs),
                l_feat / (len(subs) * msstftd_num_fmaps(disc_cfg)))

    def _generator_losses(params, qstate, disc_params, batch, rng,
                          weights: LossWeights, use_gan: bool):
        x_hat, codes, commit, new_qstate = forward_train(
            params, qstate, batch, model_cfg, n_q, rng, training=True,
            precision=precision, compute_dtype=compute_dtype)
        commit_mean = jnp.mean(commit)
        freq = _freq_loss(batch, x_hat)
        if use_gan and disc_cfg is not None and disc_cfg.time_chunk:
            # chunked-time discriminator: exact values, O(chunk) memory
            # (supersedes disc_remat — the chunk scan already remats)
            subs = disc_params["discs"]
            l_g = jnp.zeros(())
            l_feat = jnp.zeros(())
            for i, sub in enumerate(subs):
                sums = msstftd_gan_sums_chunked(
                    sub, batch, x_hat, disc_cfg, i,
                    chunk=disc_cfg.time_chunk, precision=precision,
                    compute_dtype=compute_dtype)
                l_g = l_g + sums["lg_fake"] / sums["n_logit"]
                # mean|real - fake| / mean|real| per layer: counts cancel
                l_feat = l_feat + jnp.sum(sums["feat_diff"]
                                          / sums["feat_real"])
            losses_g = total_loss(None, None, None, batch, x_hat)
            losses_g = {**losses_g,
                        "l_g": l_g / len(subs),
                        "l_feat": l_feat / (len(subs)
                                            * msstftd_num_fmaps(disc_cfg))}
        elif use_gan and disc_remat:
            losses_g = total_loss(None, None, None, batch, x_hat)
            l_g, l_feat = _gan_terms_remat(disc_params, batch, x_hat)
            losses_g = {**losses_g, "l_g": l_g, "l_feat": l_feat}
        elif use_gan:
            logits_real, fmap_real = msstftd_forward(
                disc_params, batch, disc_cfg, precision=precision,
                compute_dtype=compute_dtype)
            logits_fake, fmap_fake = msstftd_forward(
                disc_params, x_hat, disc_cfg, precision=precision,
                compute_dtype=compute_dtype)
            losses_g = total_loss(fmap_real, logits_fake, fmap_fake,
                                  batch, x_hat)
        else:
            losses_g = total_loss(None, None, None, batch, x_hat)

        loss = (losses_g["l_1"] * weights.l1
                + freq["total_loss"] * weights.freq
                + losses_g["l_2"] * weights.l2
                + commit_mean * weights.commit
                + commit_mean * weights.codebook)
        if use_gan:
            loss = loss + losses_g["l_g"] * weights.gen \
                + losses_g["l_feat"] * weights.feat
        metrics = {
            "loss": loss,
            "loss_l1": losses_g["l_1"],
            "loss_l2": losses_g["l_2"],
            "loss_freq": freq["total_loss"],
            "loss_freq_l1": freq["l1_loss"],
            "loss_freq_l2": freq["l2_loss"],
            "freq_acc": freq["acc"],
            "loss_commit": commit_mean,
        }
        if use_gan:
            metrics["loss_gen"] = losses_g["l_g"]
            metrics["loss_feat"] = losses_g["l_feat"]
        return loss, (new_qstate, metrics)

    donate_kw = dict(donate_argnums=(0,)) if donate else {}

    @functools.partial(jax.jit, static_argnames=("use_gan",), **donate_kw)
    def gen_step(state: TrainState, batch: Array, weights: LossWeights,
                 use_gan: bool = False):
        rng, step_rng = jax.random.split(state.rng)
        # spectral-norm u/v power iteration (no-op without spectral params;
        # torch iterates at every training forward)
        state = state._replace(
            params=spectral_norm_update_tree(state.params))
        grad_fn = jax.value_and_grad(_generator_losses, has_aux=True)
        (loss, (new_qstate, metrics)), grads = grad_fn(
            state.params, state.qstate, state.disc_params, batch, step_rng,
            weights, use_gan)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = weights.lr
        updates, new_opt_state = gen_opt.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state._replace(params=new_params, qstate=new_qstate,
                              opt_state=new_opt_state, rng=rng), metrics

    def _balanced_gen_step(state: TrainState, batch: Array,
                           weights: LossWeights):
        """Balancer variant: balanced wave losses + direct commit grads."""
        assert balancer is not None
        rng, step_rng = jax.random.split(state.rng)

        def fwd(params):
            x_hat, codes, commit, new_qstate = forward_train(
                params, state.qstate, batch, model_cfg, n_q, step_rng,
                training=True, precision=precision,
                compute_dtype=compute_dtype)
            return (x_hat, jnp.mean(commit)), new_qstate

        (x_hat, commit), vjp_fn, new_qstate = jax.vjp(fwd, state.params,
                                                      has_aux=True)
        loss_fns = {
            "l_t": lambda y: jnp.mean(jnp.abs(batch - y)),
            "l_f": lambda y: _freq_loss(batch, y)["total_loss"],
        }
        cot, losses, new_bal_state, bal_metrics = balance(
            balancer, loss_fns, x_hat, state.balancer_state)
        # one pullback carries both the balanced waveform cotangent and the
        # (plainly weighted) commitment-loss cotangent; like the plain
        # gen_step, the commit scalar feeds BOTH the commit and codebook
        # weights (the reference passes the same loss under both names,
        # vq.py:114)
        (grads,) = vjp_fn((cot, weights.commit + weights.codebook))
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = weights.lr
        updates, new_opt_state = gen_opt.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {f"loss_{k}": v for k, v in losses.items()}
        metrics.update(bal_metrics)
        metrics["loss_commit"] = commit
        # aligned keys for the shared logging path
        metrics["loss"] = losses["l_t"] + losses.get("l_f", 0.0)
        metrics["loss_l1"] = losses["l_t"]
        metrics["loss_l2"] = jnp.zeros(())
        metrics["loss_freq"] = losses.get("l_f", jnp.zeros(()))
        metrics["freq_acc"] = jnp.zeros(())
        metrics["grad_norm"] = optax.global_norm(grads)
        return state._replace(params=new_params, qstate=new_qstate,
                              opt_state=new_opt_state, rng=rng,
                              balancer_state=new_bal_state), metrics

    balanced_gen_step = jax.jit(_balanced_gen_step, **donate_kw) \
        if balancer else None

    @functools.partial(jax.jit, **donate_kw)
    def disc_step(state: TrainState, batch: Array, weights: LossWeights):
        rng, step_rng = jax.random.split(state.rng)
        if state.disc_params is not None:
            state = state._replace(
                disc_params=spectral_norm_update_tree(state.disc_params))
        x_hat, _, _, _ = forward_train(
            state.params, state.qstate, batch, model_cfg, n_q, step_rng,
            training=True, precision=precision, compute_dtype=compute_dtype)
        x_hat = jax.lax.stop_gradient(x_hat)

        def loss_fn(disc_params):
            if disc_cfg is not None and disc_cfg.time_chunk:
                subs = disc_params["discs"]
                loss = jnp.zeros(())
                lr_mean = jnp.zeros(())
                lf_mean = jnp.zeros(())
                for i, sub in enumerate(subs):
                    sums = msstftd_gan_sums_chunked(
                        sub, batch, x_hat, disc_cfg, i,
                        chunk=disc_cfg.time_chunk, precision=precision,
                        compute_dtype=compute_dtype)
                    n = sums["n_logit"]
                    loss = loss + (sums["sq_fake"] + sums["lg_real"]) / n
                    lr_mean = lr_mean + sums["sum_real"] / n
                    lf_mean = lf_mean + sums["sum_fake"] / n
                return loss / len(subs), (lr_mean / len(subs),
                                          lf_mean / len(subs))
            if disc_remat:
                subs = disc_params["discs"]
                loss = jnp.zeros(())
                lr_mean = jnp.zeros(())
                lf_mean = jnp.zeros(())
                for i, sub in enumerate(subs):
                    def one(sub, batch, x_hat, i=i):
                        lr, _ = msstftd_sub_forward(
                            sub, batch, disc_cfg, i, precision=precision,
                            compute_dtype=compute_dtype)
                        lf, _ = msstftd_sub_forward(
                            sub, x_hat, disc_cfg, i, precision=precision,
                            compute_dtype=compute_dtype)
                        return (jnp.mean(jnp.square(lf))
                                + jnp.mean(jnp.square(1.0 - lr)),
                                jnp.mean(lr), jnp.mean(lf))
                    l_i, lr_i, lf_i = jax.checkpoint(one)(sub, batch, x_hat)
                    loss = loss + l_i
                    lr_mean = lr_mean + lr_i
                    lf_mean = lf_mean + lf_i
                return loss / len(subs), (lr_mean / len(subs),
                                          lf_mean / len(subs))
            logits_real, _ = msstftd_forward(disc_params, batch, disc_cfg,
                                             precision=precision,
                                             compute_dtype=compute_dtype)
            logits_fake, _ = msstftd_forward(disc_params, x_hat, disc_cfg,
                                             precision=precision,
                                             compute_dtype=compute_dtype)
            loss = disc_loss(logits_real, logits_fake)
            lr_mean = sum(jnp.mean(l) for l in logits_real) / len(logits_real)
            lf_mean = sum(jnp.mean(l) for l in logits_fake) / len(logits_fake)
            return loss, (lr_mean, lf_mean)

        (loss, (lr_mean, lf_mean)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.disc_params)
        opt_state = state.disc_opt_state
        opt_state.hyperparams["learning_rate"] = weights.disc_lr
        updates, new_opt_state = disc_opt.update(grads, opt_state,
                                                 state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, updates)
        metrics = {"loss_disc": loss, "logits_real": lr_mean,
                   "logits_fake": lf_mean,
                   "disc_grad_norm": optax.global_norm(grads)}
        return state._replace(disc_params=new_disc,
                              disc_opt_state=new_opt_state, rng=rng), metrics

    @functools.partial(jax.jit, static_argnames=("use_gan",))
    def eval_step(state: TrainState, batch: Array, weights: LossWeights,
                  use_gan: bool = False):
        x_hat, codes, commit, _ = forward_train(
            state.params, state.qstate, batch, model_cfg, n_q, state.rng,
            training=False, precision=precision,
            compute_dtype=compute_dtype)
        freq = _freq_loss(batch, x_hat)
        losses_g = total_loss(None, None, None, batch, x_hat)
        loss = (losses_g["l_1"] * weights.l1 + freq["total_loss"] * weights.freq
                + losses_g["l_2"] * weights.l2 + jnp.mean(commit) * weights.commit)
        metrics = {
            "loss": loss, "loss_l1": losses_g["l_1"],
            "loss_l2": losses_g["l_2"], "loss_freq": freq["total_loss"],
            "freq_acc": freq["acc"], "loss_commit": jnp.mean(commit),
            "l_t": losses_g["l_t"], "l_t_2": losses_g["l_t_2"],
        }
        return metrics, codes, x_hat

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        # batch on `data`; when the mesh also has a `seq` axis, shard time
        # too — XLA's SPMD partitioner inserts the conv halo exchanges
        # (the manual inference-path equivalent is parallel/sp.py) and
        # gathers the hop-times-smaller token-rate sequence for the LSTM.
        if "seq" in mesh.axis_names:
            bsh = NamedSharding(mesh, P("data", "seq"))
        else:
            bsh = NamedSharding(mesh, P("data"))

        def _shard(fn, static=()):
            def wrapped(state, batch, *a, **kw):
                batch = jax.device_put(batch, bsh)
                state = jax.device_put(state, repl)
                return fn(state, batch, *a, **kw)
            return wrapped

        gen_step = _shard(gen_step)
        disc_step = _shard(disc_step)
        eval_step = _shard(eval_step)
        if balanced_gen_step is not None:
            balanced_gen_step = _shard(balanced_gen_step)

    return gen_step, disc_step, eval_step, balanced_gen_step
