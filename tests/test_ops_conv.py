"""Parity tests: ops.conv / ops.pad vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from encodec_tpu import ops
from encodec_tpu.utils import (conv1d_params_from_torch,
                               conv_transpose1d_params_from_torch)
from tests import ref_loader

ref_conv = ref_loader.load("encodec.modules.conv")

# (kernel, stride, dilation) combos actually used by the 24k/48k/breathing
# models: init k=7, downsample k=2r s=r for r in {1,2,4,5,6,8}, res blocks
# k=3 d in {1,2}, k=1, final k=7.
CONV_CASES = [
    (7, 1, 1), (3, 1, 1), (3, 1, 2), (1, 1, 1),
    (16, 8, 1), (10, 5, 1), (8, 4, 1), (4, 2, 1), (12, 6, 1), (2, 1, 1),
]


def _np(t):
    return t.detach().numpy()


def _state(mod):
    return {k: _np(v) for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("kernel,stride,dilation", CONV_CASES)
@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("pad_mode", ["reflect", "zero"])
def test_sconv1d_parity(kernel, stride, dilation, causal, pad_mode):
    if stride > 1 and dilation > 1:
        pytest.skip("unused combination")
    torch.manual_seed(0)
    cin, cout, T = 5, 7, 97
    # the reference crashes on pad_mode='zero' (torch spells it 'constant');
    # map the spelling for the oracle, keep 'zero' on our side.
    torch_mode = "constant" if pad_mode == "zero" else pad_mode
    m = ref_conv.SConv1d(cin, cout, kernel, stride=stride, dilation=dilation,
                         causal=causal, norm="none", pad_mode=torch_mode)
    x = torch.randn(2, cin, T)
    with torch.no_grad():
        y_ref = _np(m(x))  # [B, C, T]

    params = conv1d_params_from_torch(_state(m), "conv.", norm="none")
    xj = jnp.asarray(_np(x).transpose(0, 2, 1))  # [B, T, C]
    y = ops.sconv1d(params, xj, kernel_size=kernel, stride=stride,
                    dilation=dilation, causal=causal, norm="none",
                    pad_mode=pad_mode)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm", ["weight_norm", "layer_norm"])
def test_sconv1d_norms_parity(norm):
    torch.manual_seed(1)
    cin, cout, T = 8, 16, 64
    m = ref_conv.SConv1d(cin, cout, 7, stride=2, causal=True, norm=norm)
    # randomize the norm affine params so the test is not trivial
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "norm" in name and "weight_norm" != norm:
                p.copy_(torch.randn_like(p))
    x = torch.randn(3, cin, T)
    with torch.no_grad():
        y_ref = _np(m(x))
    params = conv1d_params_from_torch(_state(m), "conv.", norm=norm)
    y = ops.sconv1d(params, jnp.asarray(_np(x).transpose(0, 2, 1)),
                    kernel_size=7, stride=2, causal=True, norm=norm)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-5)


def test_time_group_norm_parity():
    torch.manual_seed(4)
    cin, cout, T = 8, 16, 64
    m = ref_conv.SConv1d(cin, cout, 7, stride=2, causal=False,
                         norm="time_group_norm")
    with torch.no_grad():
        m.conv.norm.weight.copy_(torch.randn_like(m.conv.norm.weight))
        m.conv.norm.bias.copy_(torch.randn_like(m.conv.norm.bias))
    x = torch.randn(3, cin, T)
    with torch.no_grad():
        y_ref = _np(m(x))
    params = conv1d_params_from_torch(_state(m), "conv.", norm="time_group_norm")
    y = ops.sconv1d(params, jnp.asarray(_np(x).transpose(0, 2, 1)),
                    kernel_size=7, stride=2, causal=False, norm="time_group_norm")
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kernel,stride", [(16, 8), (10, 5), (8, 4), (4, 2),
                                           (12, 6), (2, 1)])
@pytest.mark.parametrize("causal,trim", [(True, 1.0), (True, 0.5), (False, 1.0)])
@pytest.mark.parametrize("norm", ["none", "weight_norm"])
def test_sconv_transpose1d_parity(kernel, stride, causal, trim, norm):
    torch.manual_seed(2)
    cin, cout, T = 6, 4, 31
    m = ref_conv.SConvTranspose1d(cin, cout, kernel, stride=stride,
                                  causal=causal, trim_right_ratio=trim,
                                  norm=norm)
    x = torch.randn(2, cin, T)
    with torch.no_grad():
        y_ref = _np(m(x))
    params = conv_transpose1d_params_from_torch(_state(m), "convtr.", norm=norm)
    y = ops.sconv_transpose1d(params, jnp.asarray(_np(x).transpose(0, 2, 1)),
                              kernel_size=kernel, stride=stride, causal=causal,
                              norm=norm, trim_right_ratio=trim)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,cin,cout,dil", [(7, 32, 1, 1), (3, 32, 16, 1),
                                            (3, 32, 16, 3), (1, 16, 32, 1),
                                            (7, 1, 32, 1)])
def test_conv1d_auto_lowering_matches_mxu(k, cin, cout, dil):
    # lowering="auto" sends small-channel stride-1 f32 convs down the
    # shift/VPU form (decoder tail hot path on TPU); results must agree
    # with the MXU form to f32 reassociation tolerance.
    rng = np.random.default_rng(k * 31 + cout)
    x = jnp.asarray(rng.standard_normal((3, 200, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    y_mxu = ops.conv1d(x, w, b, dilation=dil)
    y_auto = ops.conv1d(x, w, b, dilation=dil, lowering="auto")
    assert y_auto.shape == y_mxu.shape
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_mxu),
                               rtol=1e-5, atol=1e-6)


def test_conv1d_auto_lowering_fallbacks():
    # Large channel products, strides, and bf16 inputs must take the MXU
    # path unchanged under lowering="auto" (bitwise-equal to the default).
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)
    wb = jnp.asarray(rng.standard_normal((3, 64, 64)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ops.conv1d(xb, wb, lowering="auto")),
        np.asarray(ops.conv1d(xb, wb)))
    xs = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((4, 8, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ops.conv1d(xs, ws, stride=2, lowering="auto")),
        np.asarray(ops.conv1d(xs, ws, stride=2)))
    np.testing.assert_array_equal(
        np.asarray(ops.conv1d(xs.astype(jnp.bfloat16),
                              ws.astype(jnp.bfloat16), lowering="auto")),
        np.asarray(ops.conv1d(xs.astype(jnp.bfloat16),
                              ws.astype(jnp.bfloat16))))


def test_pad1d_reflect_short_input():
    # reflect pad where pad >= length exercises the zero-extension workaround
    x = torch.randn(1, 2, 3)
    y_ref = _np(ref_conv.pad1d(x, (5, 5), mode="reflect"))
    y = ops.pad1d(jnp.asarray(_np(x).transpose(0, 2, 1)), (5, 5), mode="reflect")
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref)


def test_extra_padding_matches_reference():
    for L in [1, 5, 17, 100, 321, 1000]:
        for k, s in [(7, 1), (16, 8), (4, 2), (3, 1)]:
            pt = k - s
            ref = ref_conv.get_extra_padding_for_conv1d(
                torch.zeros(1, 1, L), k, s, pt)
            got = ops.get_extra_padding_for_conv1d(L, k, s, pt)
            assert got == ref, (L, k, s)


def test_fold_weight_norm_matches():
    torch.manual_seed(3)
    m = ref_conv.SConv1d(4, 8, 7, stride=2, norm="weight_norm")
    params = conv1d_params_from_torch(_state(m), "conv.", norm="weight_norm")
    folded = ops.fold_weight_norm(params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 50, 4).astype(np.float32))
    y1 = ops.sconv1d(params, x, kernel_size=7, stride=2)
    y2 = ops.sconv1d(folded, x, kernel_size=7, stride=2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6, atol=1e-6)


def test_spectral_norm_parity_with_torch():
    """spectral_norm (ref conv.py:22,26-35 via CONV_NORMALIZATIONS) vs
    torch.nn.utils.spectral_norm: same effective weight from the same
    (u, v) state, and the same state after power iterations — for Conv1d
    (dim=0) and ConvTranspose1d (torch defaults to dim=1)."""
    from encodec_tpu.ops.conv import (_spectral_weight,
                                      spectral_norm_power_iterate)

    torch.manual_seed(0)
    for transposed in (False, True):
        if transposed:
            mod = torch.nn.ConvTranspose1d(6, 10, 5)
            to_wio = lambda w: w.detach().numpy().transpose(2, 0, 1)
        else:
            mod = torch.nn.Conv1d(6, 10, 5)
            to_wio = lambda w: w.detach().numpy().transpose(2, 1, 0)
        mod = torch.nn.utils.spectral_norm(mod)
        # np.array copies: torch updates u/v IN PLACE, and jnp.asarray on
        # CPU may alias the torch memory.
        params = {
            "w_orig": jnp.asarray(np.array(to_wio(mod.weight_orig))),
            "u_sn": jnp.asarray(np.array(mod.weight_u.detach().numpy())),
            "v_sn": jnp.asarray(np.array(mod.weight_v.detach().numpy())),
        }
        # eval mode: sigma from the stored state, no iteration
        mod.eval()
        x = torch.randn(1, 6, 20)
        with torch.no_grad():
            mod(x)
        w_ref = to_wio(mod.weight)
        np.testing.assert_allclose(np.asarray(_spectral_weight(params)),
                                   w_ref, rtol=1e-5, atol=1e-6)
        # train mode: one power iteration per forward
        mod.train()
        for it in range(3):
            with torch.no_grad():
                mod(x)
            params = spectral_norm_power_iterate(params)
            np.testing.assert_allclose(
                np.asarray(params["u_sn"]),
                mod.weight_u.detach().numpy(), rtol=1e-5, atol=1e-6,
                err_msg=f"u after iter {it}, transposed={transposed}")
            np.testing.assert_allclose(
                np.asarray(_spectral_weight(params)), to_wio(mod.weight),
                rtol=1e-5, atol=1e-6,
                err_msg=f"w after iter {it}, transposed={transposed}")


def test_sconv1d_spectral_norm_forward():
    """spectral_norm is accepted wherever CONV_NORMALIZATIONS is honored."""
    import jax
    from encodec_tpu.ops.conv import init_sconv1d, sconv1d
    from encodec_tpu.ops.conv2d import init_conv2d, conv2d
    p = init_sconv1d(jax.random.PRNGKey(0), 4, 8, 3, norm="spectral_norm")
    assert {"w_orig", "u_sn", "v_sn"} <= set(p)
    y = sconv1d(p, jnp.ones((2, 16, 4)), kernel_size=3, norm="spectral_norm")
    assert y.shape == (2, 16, 8) and bool(jnp.isfinite(y).all())
    p2 = init_conv2d(jax.random.PRNGKey(1), 3, 5, (3, 3),
                     norm="spectral_norm")
    y2 = conv2d(p2, jnp.ones((1, 8, 8, 3)), padding=(1, 1))
    assert y2.shape == (1, 8, 8, 5) and bool(jnp.isfinite(y2).all())


def test_sconv1d_stream_finish_matches_batch_tail():
    """Streaming finish == the batch conv's final frames for every
    non-stride-multiple tail length (the batch path right-pads each conv so
    its last window is full; ref conv.py:55-62)."""
    import jax
    from encodec_tpu.ops.conv import sconv1d
    from encodec_tpu.ops.streaming import (prime_conv_stream, sconv1d_stream,
                                           sconv1d_stream_finish)
    rng = np.random.RandomState(0)
    for (k, s, d) in [(8, 4, 1), (10, 5, 1), (7, 1, 3), (3, 1, 1)]:
        w = jnp.asarray(rng.randn(k, 3, 5).astype(np.float32) * 0.2)
        params = {"w": w, "b": jnp.asarray(rng.randn(5).astype(np.float32))}
        # the first chunk must cover the reflect priming context
        # (ctx + 1 = (k-1)*d + 1 - s + 1 samples; see min_first_chunk)
        ctx = (k - 1) * d + 1 - s
        first = s * max(10, -(-(ctx + 1) // s))
        for r in range(1, s) if s > 1 else [0]:
            T = first + s * 6 + r
            x = jnp.asarray(rng.randn(2, T, 3).astype(np.float32))
            full = sconv1d(params, x, kernel_size=k, stride=s, dilation=d,
                           causal=True, pad_mode="reflect")
            st = prime_conv_stream(x[:, :first], k, s, d)
            y1, st = sconv1d_stream(params, x[:, :first], st,
                                    kernel_size=k, stride=s, dilation=d)
            y2, st = sconv1d_stream(params, x[:, first:first + s * 6], st,
                                    kernel_size=k, stride=s, dilation=d)
            if r:
                y3 = sconv1d_stream_finish(params, x[:, first + s * 6:], st,
                                           kernel_size=k, stride=s,
                                           dilation=d)
                got = jnp.concatenate([y1, y2, y3], axis=1)
            else:
                got = jnp.concatenate([y1, y2], axis=1)
            np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"k={k} s={s} d={d} r={r}")
