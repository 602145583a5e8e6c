"""Parity tests: streaming transformer LM vs the reference LMModel."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from encodec_tpu.models.lm import (LMConfig, init_lm, lm_forward_batch,
                                   init_lm_stream, lm_step)
from encodec_tpu.models.torch_zoo import lm_params_from_torch
from tests import ref_loader

ref_model = ref_loader.load("encodec.model")


def _make_pair(n_q=4, card=32, dim=16, num_layers=2, past_context=6, seed=0):
    torch.manual_seed(seed)
    ref = ref_model.LMModel(n_q=n_q, card=card, dim=dim,
                            num_layers=num_layers, past_context=past_context)
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = LMConfig(n_q=n_q, card=card, dim=dim, num_layers=num_layers,
                   past_context=past_context)
    params = lm_params_from_torch(state, n_q, num_layers)
    return ref, cfg, params


def test_lm_batch_parity():
    ref, cfg, params = _make_pair()
    B, K, T = 2, 4, 12
    torch.manual_seed(1)
    indices = torch.randint(0, cfg.card + 1, (B, K, T))
    with torch.no_grad():
        probas_ref, _, off = ref(indices)
    probas = lm_forward_batch(params, jnp.asarray(indices.numpy()), cfg)
    assert off == T
    np.testing.assert_allclose(np.asarray(probas), probas_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lm_batch_parity_partial_codebooks():
    """K < n_q (lower bandwidth) uses only the first K emb/heads."""
    ref, cfg, params = _make_pair()
    B, K, T = 1, 2, 5
    torch.manual_seed(2)
    indices = torch.randint(0, cfg.card + 1, (B, K, T))
    with torch.no_grad():
        probas_ref, _, _ = ref(indices)
    probas = lm_forward_batch(params, jnp.asarray(indices.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(probas), probas_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lm_streaming_matches_reference_streaming():
    """Step-by-step ring-buffer decode == reference's growing-cache decode,
    across the point where the zero entry falls out of the window."""
    ref, cfg, params = _make_pair(past_context=4)
    K, T = 4, 10
    torch.manual_seed(3)
    indices = torch.randint(0, cfg.card + 1, (1, K, T))

    # reference, threaded one step at a time
    states, offset = None, 0
    ref_out = []
    with torch.no_grad():
        for t in range(T):
            p, states, offset = ref(indices[:, :, t:t + 1], states, offset)
            ref_out.append(p[:, :, :, 0].numpy())

    # ours, jitted single-step ring buffer
    state = init_lm_stream(cfg, batch=1)
    step = jax.jit(lambda p, i, s: lm_step(p, i, s, cfg))
    for t in range(T):
        probas, state = step(params, jnp.asarray(indices[:, :, t].numpy()), state)
        np.testing.assert_allclose(np.asarray(probas), ref_out[t],
                                   rtol=1e-4, atol=1e-5, err_msg=f"t={t}")


def test_lm_batch_matches_streaming():
    cfg = LMConfig(n_q=3, card=16, dim=16, num_layers=2, past_context=5)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    K, T = 3, 9
    indices = jax.random.randint(jax.random.PRNGKey(1), (1, K, T), 0, cfg.card + 1)
    batch = lm_forward_batch(params, indices, cfg)
    state = init_lm_stream(cfg, batch=1)
    for t in range(T):
        probas, state = lm_step(params, indices[:, :, t], state, cfg)
        np.testing.assert_allclose(np.asarray(probas),
                                   np.asarray(batch[:, :, :, t]),
                                   rtol=1e-4, atol=1e-5, err_msg=f"t={t}")


def test_lmmodel_call_reference_signature():
    """LMModel(indices, states, offset) matches the reference full call."""
    from encodec_tpu.models.lm import LMModel
    ref, cfg, params = _make_pair(past_context=6)
    wrapper = LMModel(cfg, params)
    B, K, T = 1, 4, 8
    torch.manual_seed(9)
    indices = torch.randint(0, cfg.card + 1, (B, K, T))
    with torch.no_grad():
        probas_ref, _, off_ref = ref(indices)
    probas, states, off = wrapper(jnp.asarray(indices.numpy()))
    assert off == off_ref == T
    np.testing.assert_allclose(np.asarray(probas), probas_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    # continuing the stream threads state like the reference
    more = torch.randint(0, cfg.card + 1, (B, K, 3))
    with torch.no_grad():
        probas2_ref, _, _ = ref(more, None, 0)  # oracle: restart not equal
    probas2, states, off = wrapper(jnp.asarray(more.numpy()), states, off)
    assert off == T + 3


def test_lm_chunk_codec_decoder_reproduces_encoder_probas():
    """The .ecdc LM interchange contract: the decoder's per-token re-runs of
    the pinned chunk executable reproduce the encoder's teacher-forced
    probabilities BIT-exactly (same executable + causal prefix =>
    identical float32), across chunk boundaries and a partial last chunk."""
    from encodec_tpu.models.lm import LMModel
    cfg = LMConfig(n_q=3, card=16, dim=16, num_layers=2, past_context=4)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(6), cfg))
    lm.CODEC_CHUNK = 5                      # force several chunks + a stub
    K, T = 3, 13
    codes = np.asarray(jax.random.randint(jax.random.PRNGKey(7), (K, T), 0,
                                          cfg.card), np.int64)
    enc = lm.codec_probas(codes)            # [T, K, card]

    # decoder-side reconstruction: per token, re-run the chunk scan over the
    # decoded prefix (zeros beyond), exactly as _decode_frame_lm does —
    # except codes are taken as already known.
    chunk = lm.CODEC_CHUNK
    exec_ = lm.chunk_exec(1, K, chunk)
    slicer = lm.chunk_slicer()
    state = lm.init_stream(batch=1)
    dec = np.empty_like(enc)
    shifted = np.zeros((1, K, chunk), np.int32)
    for c in range(-(-T // chunk)):
        lo, hi = c * chunk, min(T, c * chunk + chunk)
        shifted[:] = 0
        if c > 0:
            shifted[0, :, 0] = 1 + codes[:, lo - 1]
        last_state = None
        for t in range(lo, hi):
            probas, out_state = exec_(lm.params, jnp.asarray(shifted), state)
            last_state = out_state
            dec[t] = np.asarray(slicer(probas, t - lo)).T
            if t + 1 < hi:
                shifted[0, :, t + 1 - lo] = 1 + codes[:, t]
        state = last_state
    np.testing.assert_array_equal(dec, enc)


def test_lm_compress_decompress_chunked_roundtrip():
    """End-to-end .ecdc LM frame through the real codec path: device-built
    symbol bounds + AC encode, then _decode_frame_lm (device CDF rows);
    codes roundtrip exactly across chunk boundaries + a partial chunk."""
    import io
    from encodec_tpu.models.lm import LMModel
    from encodec_tpu.stream.ac import ArithmeticCoder
    from encodec_tpu.stream.compress import _decode_frame_lm
    cfg = LMConfig(n_q=3, card=16, dim=16, num_layers=2, past_context=4)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(8), cfg))
    lm.CODEC_CHUNK = 4
    K, T = 3, 11
    codes = np.asarray(jax.random.randint(jax.random.PRNGKey(9), (K, T), 0,
                                          cfg.card), np.int64)
    lows, highs = lm.codec_symbol_bounds(codes)
    fo = io.BytesIO()
    coder = ArithmeticCoder(fo)
    for lo_i, hi_i in zip(lows, highs):
        coder.push_bounds(int(lo_i), int(hi_i))
    coder.flush()
    out = _decode_frame_lm(io.BytesIO(fo.getvalue()), lm, K, T)
    np.testing.assert_array_equal(out, codes)


def test_lm_export_roundtrip_into_reference():
    """Bidirectional LM interchange: our LM params export back into the
    reference's own LMModel via load_state_dict, which then produces
    probabilities matching ours — LMs trained here drive the reference's
    --lm compression path unchanged."""
    from encodec_tpu.models.torch_zoo import torch_state_from_lm_params
    n_q, card, num_layers = 3, 24, 2
    ref, cfg, params = _make_pair(n_q=n_q, card=card, dim=16,
                                  num_layers=num_layers, seed=5)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in torch_state_from_lm_params(params).items()}
    ref2 = ref_model.LMModel(n_q=n_q, card=card, dim=16,
                             num_layers=num_layers, past_context=6)
    ref2.load_state_dict(sd, strict=True)
    ref2.eval()

    # exported state is numerically identical to the source module's
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(sd[k].numpy(), v.detach().numpy(),
                                      err_msg=k)

    codes = torch.from_numpy(
        np.random.RandomState(0).randint(0, card, size=(1, n_q, 7)))
    with torch.no_grad():
        p1, _, _ = ref(codes)
        p2, _, _ = ref2(codes)
    np.testing.assert_array_equal(p1.numpy(), p2.numpy())
