"""LM training: cross-entropy descends below the uniform bound and a
trained LM actually shrinks the .ecdc stream vs raw bit packing."""

import numpy as np

import jax
import jax.numpy as jnp

from encodec_tpu.models.lm import LMConfig, LMModel, init_lm
from encodec_tpu.train.lm_train import (lm_loss, create_lm_train_state,
                                        make_lm_train_step, shift_codes)


def _structured_codes(rng, B, K, T, card):
    """Highly predictable code streams: per-codebook deterministic cycles
    with occasional noise — entropy far below log2(card)."""
    base = (np.arange(T)[None, None, :] * (1 + np.arange(K))[None, :, None]) % card
    noise = rng.randint(0, card, size=(B, K, T))
    mask = rng.rand(B, K, T) < 0.05
    return np.where(mask, noise, np.broadcast_to(base, (B, K, T))).astype(np.int32)


def test_lm_training_reduces_entropy():
    cfg = LMConfig(n_q=4, card=32, dim=32, num_layers=2, past_context=16)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    codes = jnp.asarray(_structured_codes(rng, 8, 4, 24, 32))

    loss0, m0 = lm_loss(params, codes, cfg)
    uniform_bits = np.log2(32)
    opt, opt_state = create_lm_train_state(params, lr=3e-3)
    step = make_lm_train_step(cfg, opt)
    for i in range(150):
        batch = jnp.asarray(_structured_codes(rng, 8, 4, 24, 32))
        params, opt_state, metrics = step(params, opt_state, batch)
    bits = float(metrics["bits_per_code"])
    assert np.isfinite(bits)
    assert bits < uniform_bits * 0.6, (bits, uniform_bits)

    # trained LM compresses below raw bit packing on held-out codes
    from encodec_tpu.stream.ac import (ArithmeticCoder,
                                       build_stable_quantized_cdf_batch)
    from encodec_tpu.stream.binary import pack_bits
    import io
    lm = LMModel(cfg, params)
    held = _structured_codes(np.random.RandomState(99), 1, 4, 48, 32)[0]
    K, T = held.shape
    raw = pack_bits(held.T, 5)  # 5 bits/code at card 32

    state = lm.init_stream(1)
    inp = jnp.zeros((1, K), jnp.int32)
    fo = io.BytesIO()
    coder = ArithmeticCoder(fo)
    for t in range(T):
        probas, state = lm.step(inp, state)
        cdfs = build_stable_quantized_cdf_batch(np.asarray(probas[0]).T, 24)
        for k in range(K):
            coder.push(int(held[k, t]), cdfs[k])
        inp = jnp.asarray(1 + held[None, :, t].astype(np.int32))
    coder.flush()
    entropy_coded = fo.getvalue()
    assert len(entropy_coded) < 0.8 * len(raw), (len(entropy_coded), len(raw))


def test_shift_codes_convention():
    codes = jnp.arange(6).reshape(1, 2, 3)
    shifted = shift_codes(codes)
    np.testing.assert_array_equal(np.asarray(shifted[0, 0]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(shifted[0, 1]), [0, 4, 5])
