"""Gradient-balancing loss combiner.

Behavioral reference: encodec/balancer.py:31-118. The reference defines the
balancer but never wires it into train.py; here it is a first-class option
of the training step (SURVEY §7 item 7: "implement it properly").

JAX formulation: for each loss `l_i(x̂)` we need `g_i = ∂l_i/∂x̂`. Each loss
is cheap in x̂ (elementwise / small STFTs), so per-loss `jax.grad` w.r.t. x̂
costs little. The per-loss gradient norms are EMA-averaged in an explicit
state, each gradient is rescaled so loss i contributes
`weight_i / Σweights * total_norm`, and the combined cotangent is pulled
back through the generator with one `jax.vjp`. Under pjit, the EMA state is
replicated and the norms are global means — the reference's
`average_metrics` all-reduce falls out for free.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def averager(beta: float = 1.0):
    """Exponential-moving-average callback over metric dicts
    (ref balancer.py:10-28): call repeatedly with new metrics, get the
    running (de-biased) averages back. beta=1 is plain averaging."""
    total: tp.Dict[str, float] = {}
    fix: tp.Dict[str, float] = {}

    def _update(metrics: tp.Dict[str, tp.Any],
                weight: float = 1.0) -> tp.Dict[str, float]:
        for key, value in metrics.items():
            total[key] = total.get(key, 0.0) * beta + weight * float(value)
            fix[key] = fix.get(key, 0.0) * beta + weight
        return {key: tot / fix[key] for key, tot in total.items()}
    return _update


@dataclasses.dataclass(frozen=True)
class Balancer:
    weights: tp.Dict[str, float]
    rescale_grads: bool = True
    total_norm: float = 1.0
    ema_decay: float = 0.999
    per_batch_item: bool = True
    epsilon: float = 1e-12


def init_balancer_state(balancer: Balancer) -> dict:
    keys = sorted(balancer.weights)
    return {
        "total": {k: jnp.zeros(()) for k in keys},
        "fix": {k: jnp.zeros(()) for k in keys},
    }


def _ema_update(state: dict, norms: tp.Dict[str, Array], decay: float,
                weight: float = 1.0):
    new_total = {k: state["total"][k] * decay + weight * norms[k]
                 for k in norms}
    new_fix = {k: state["fix"][k] * decay + weight for k in norms}
    avg = {k: new_total[k] / new_fix[k] for k in norms}
    return avg, {"total": new_total, "fix": new_fix}


def balance(balancer: Balancer, loss_fns: tp.Dict[str, tp.Callable[[Array], Array]],
            x_hat: Array, state: dict):
    """Compute the balanced cotangent for `x_hat`.

    Returns `(cotangent, losses, new_state, metrics)`. Backprop through the
    generator as `vjp_fn(cotangent)` (see train.step). Matches the exact
    gradient arithmetic of the reference `Balancer.backward`.
    """
    norms: tp.Dict[str, Array] = {}
    grads: tp.Dict[str, Array] = {}
    losses: tp.Dict[str, Array] = {}
    for name, fn in loss_fns.items():
        loss, grad = jax.value_and_grad(fn)(x_hat)
        losses[name] = loss
        if balancer.per_batch_item:
            dims = tuple(range(1, grad.ndim))
            norm = jnp.mean(jnp.sqrt(jnp.sum(jnp.square(grad), axis=dims)))
        else:
            norm = jnp.sqrt(jnp.sum(jnp.square(grad)))
        norms[name] = norm
        grads[name] = grad

    avg_norms, new_state = _ema_update(state, norms, balancer.ema_decay)
    total = sum(avg_norms.values())
    metrics = {f"ratio_{k}": v / total for k, v in avg_norms.items()}

    total_weights = sum(balancer.weights[k] for k in avg_norms)
    out_grad = jnp.zeros_like(x_hat)
    for name, avg_norm in avg_norms.items():
        if balancer.rescale_grads:
            ratio = balancer.weights[name] / total_weights
            scale = ratio * balancer.total_norm / (balancer.epsilon + avg_norm)
            out_grad = out_grad + grads[name] * scale
        else:
            out_grad = out_grad + balancer.weights[name] * grads[name]
    return out_grad, losses, new_state, metrics
