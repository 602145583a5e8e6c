"""Entropy-model (LM) training.

The reference ships only *pretrained* LMs (model.py:265-284) — there is no
LM training code to port. This module completes the capability: train the
multi-codebook transformer prior on RVQ code sequences (e.g. dumped by
`tools.inference.process_dataset`) so the arithmetic coder approaches the
codes' empirical entropy. Teacher-forced next-code cross-entropy over all
codebooks, one jitted step.

Typical gain mirrors the reference's published figure for its pretrained
LMs ("20 to 30%" size reduction, compress.py:41), depending on code
predictability.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax

from ..models.lm import LMConfig, lm_forward_batch

Array = jnp.ndarray


def shift_codes(codes: Array) -> Array:
    """codes `[B, K, T]` → LM inputs `[B, K, T]` (1 + previous code, 0 at
    t=0 — the convention of model.py:64-71 / compress.py:69-78)."""
    B, K, T = codes.shape
    return jnp.concatenate(
        [jnp.zeros((B, K, 1), codes.dtype), 1 + codes[:, :, :-1]], axis=2)


def lm_loss(params: dict, codes: Array, cfg: LMConfig,
            precision=None) -> tp.Tuple[Array, dict]:
    """Mean next-code cross-entropy (nats) over `[B, K, T]` codes."""
    inputs = shift_codes(codes)
    logits = lm_forward_batch(params, inputs, cfg, precision=precision,
                              return_logits=True)       # [B, card, K, T]
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, codes[:, None], axis=1)[:, 0]
    loss = jnp.mean(nll)
    bits_per_code = loss / jnp.log(2.0)
    return loss, {"nll": loss, "bits_per_code": bits_per_code}


def create_lm_train_state(params: dict, lr: float = 3e-4,
                          clip: tp.Optional[float] = 1.0):
    """(opt, opt_state) for LM training (Adam + global-norm clip)."""
    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.adam(lr))
    opt = optax.chain(*chain)
    return opt, opt.init(params)


def make_lm_train_step(cfg: LMConfig, opt, precision=None):
    @jax.jit
    def step(params, opt_state, codes):
        (loss, metrics), grads = jax.value_and_grad(
            lm_loss, has_aux=True)(params, codes, cfg, precision=precision)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics
    return step
