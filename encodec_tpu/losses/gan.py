"""Generator / discriminator losses (ref encodec/my_code/losses.py).

LSGAN-style objectives as used by the fork:
  generator:     l_g    = mean_k mean((1 - D_k(x̂))²)
  feature match: l_feat = mean_{k,l} ‖D_k^l(x) - D_k^l(x̂)‖₁ / mean|D_k^l(x)|
  discriminator: l_d    = mean_k [mean(D_k(x̂)²) + mean((1 - D_k(x))²)]
plus plain time-domain L1/L2 terms (both per-batch-item and scalar).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def total_loss(fmap_real, logits_fake, fmap_fake, input_wav: Array,
               output_wav: Array) -> tp.Dict[str, Array]:
    """Generator-side losses. Waveforms are `[B, T, C]` (any matching
    layout works — reductions are global / per-item)."""
    reduce_dims = tuple(range(1, input_wav.ndim))
    diff = input_wav - output_wav
    l_t = jnp.mean(jnp.abs(diff), axis=reduce_dims)      # [B]
    l_t_2 = jnp.mean(jnp.square(diff), axis=reduce_dims)  # [B]
    l1 = jnp.mean(jnp.abs(diff))
    l2 = jnp.mean(jnp.square(diff))

    if fmap_real is not None:
        l_g = 0.0
        l_feat = 0.0
        for k in range(len(fmap_real)):
            l_g = l_g + jnp.mean(jnp.square(1.0 - logits_fake[k]))
            for l in range(len(fmap_real[k])):
                # f32 accumulation: fmaps may be bf16 under mixed precision
                real = jax.lax.stop_gradient(fmap_real[k][l])
                l_feat = l_feat + (
                    jnp.mean(jnp.abs(real - fmap_fake[k][l]),
                             dtype=jnp.float32)
                    / jnp.mean(jnp.abs(real), dtype=jnp.float32))
        l_feat = l_feat / (len(fmap_real) * len(fmap_real[0]))
        l_g = l_g / len(fmap_real)
    else:
        l_g = jnp.zeros(())
        l_feat = jnp.zeros(())

    return {"l_t": l_t, "l_t_2": l_t_2, "l_1": l1, "l_2": l2,
            "l_g": l_g, "l_feat": l_feat}


def disc_loss(logits_real, logits_fake) -> Array:
    """DAC-style LSGAN discriminator loss (ref losses.py:155-162)."""
    loss_d = 0.0
    for lr, lf in zip(logits_real, logits_fake):
        loss_d = loss_d + jnp.mean(jnp.square(lf)) \
            + jnp.mean(jnp.square(1.0 - lr))
    return loss_d / len(logits_real)
