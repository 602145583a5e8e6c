"""Where does the lmv=3 integer-LM decode token go? (real chip)

BENCH round 4: fused integer decode = 0.72 ms/token (RTT-corrected) vs
0.302 for the pinned float path — find the integer surcharge before
optimizing. Each component below runs as a 256-iteration `lax.scan`
whose carry feeds the next iteration (defeats DCE and amortizes the
tunnel RTT), timed with the scalar-fetch discipline from BENCH.md.

Components:
  step     — full ilm_step (the decode cell, no AC pull)
  pull     — device_ac.ac_pull_row on realistic CDF rows
  linears  — the 5 layers x (q,k,v,out,ff1,ff2) integer matmul chain
  attn     — qk logits + integer softmax + attention-out einsums (int32)
  norm     — the 3x5 integer layernorms (u32-limb variance + LUT rsqrt)
  head     — final CDF head (K int8 dots + exp2 LUT + scores_to_cdf)

Usage: timeout 1800 python probes/ilm_profile.py [--cpu]
"""
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

N_ITERS = 256
K = 8  # codebooks at 6 kbps


def timed(fn, *args, reps=5):
    """Best-of-reps wall time of a jitted scan program, scalar-fetch
    synced (see BENCH.md: block_until_ready can return early through the
    tunnel; a jitted 1-element fetch is the reliable probe)."""
    out = fn(*args)
    probe = jax.jit(lambda t: jnp.ravel(
        jax.tree.leaves(t)[0])[0].astype(jnp.float32))
    float(probe(out))  # warm both executables
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(probe(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from encodec_tpu.models.lm import LMConfig, init_lm
    from encodec_tpu.models import ilm
    from encodec_tpu.stream import device_ac

    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind, flush=True)

    cfg = LMConfig(n_q=K, card=1024, dim=200, num_heads=8, num_layers=5,
                   past_context=262)
    params = init_lm(jax.random.PRNGKey(0), cfg)
    iparams, exps = ilm.quantize_lm_params(params, cfg)
    iparams = jax.tree.map(jnp.asarray, iparams)
    state = ilm.init_ilm_stream(iparams, exps, cfg, batch=1)

    d, W, H = cfg.dim, cfg.past_context, cfg.num_heads
    hd = d // H
    eps_kd = ilm.layernorm_consts(d)
    lut = iparams["lut"]
    ks = ilm.qk_scale_const(hd)

    # -- full decode cell, scanned ------------------------------------
    def scan_step(ip, st):
        def body(carry, _):
            st, prev = carry
            rows, st = ilm.ilm_step(ip, exps, prev, st, cfg)
            nxt = (rows[:, 0, :1] & 1023).astype(jnp.int32)  # data dep
            return (st, jnp.broadcast_to(nxt, prev.shape)), ()
        (st, _), _ = jax.lax.scan(
            body, (st, jnp.zeros((1, K), jnp.int32)), None, length=N_ITERS)
        return st.kcache
    t = timed(jax.jit(scan_step), iparams, state)
    print(f"step (full cell):   {1e3 * t / N_ITERS:7.3f} ms/token", flush=True)

    # -- AC pull on realistic rows ------------------------------------
    rows0, _ = ilm.ilm_step(iparams, exps, jnp.zeros((1, K), jnp.int32),
                            state, cfg)
    data = jnp.zeros((1, 4096), jnp.uint8)
    nbits = jnp.full((1,), 4096 * 8, jnp.int32)
    ac0 = device_ac.init_state(batch=1)

    def scan_pull(rows, ac):
        pull = jax.vmap(device_ac.ac_pull_row, in_axes=(0, 0, 0, 0))
        def body(carry, _):
            ac, = carry
            ac, syms, ok, eof = pull(ac, rows, data, nbits)
            return (ac,), ()
        (ac,), _ = jax.lax.scan(body, (ac,), None, length=N_ITERS)
        return ac
    try:
        t = timed(jax.jit(scan_pull), rows0, ac0)
        print(f"pull (AC row):      {1e3 * t / N_ITERS:7.3f} ms/token",
              flush=True)
    except Exception as e:  # signature drift — component probe only
        print("pull: skipped:", str(e)[:120], flush=True)

    x0 = jnp.zeros((1, 1, d), jnp.int32) + 37

    # -- linear chain --------------------------------------------------
    def scan_linears(ip, x):
        def body(x, _):
            for li, layer in enumerate(ip["layers"]):
                e = ilm._exps_of(exps, li)
                q = ilm._linear(x, layer["q"], e["q"])
                k = ilm._linear(x, layer["k"], e["k"])
                v = ilm._linear(x, layer["v"], e["v"])
                o = ilm._linear(q + k + v, layer["out"], e["out"])
                h = ilm._gelu_int(ilm._linear(x + o, layer["ff1"], e["ff1"]),
                                  ip["lut"]["gelu"])
                x = jnp.clip(ilm._linear(h, layer["ff2"], e["ff2"]),
                             -ilm.ACT_MAX, ilm.ACT_MAX)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x
    t = timed(jax.jit(scan_linears), iparams, x0)
    print(f"linears (5x6 dots): {1e3 * t / N_ITERS:7.3f} ms/token", flush=True)

    # -- attention math (qk einsum + softmax + out einsum), 5 layers ----
    keys0 = state.kcache[0].astype(jnp.int32)          # [1, W, d]
    def scan_attn(keys, q):
        mask = jnp.ones((1, 1, 1, W + 1), bool)
        def body(q, _):
            for _li in range(cfg.num_layers):
                kk = jnp.concatenate([keys, q], axis=1)
                q7 = jnp.clip(ilm._rshift_round(q, ilm.ABITS - ilm.QBITS),
                              -2047, 2047)
                qh = q7.reshape(1, 1, H, hd)
                kh = kk.reshape(1, W + 1, H, hd)
                logits = jnp.einsum("bthd,bshd->bhts", qh, kh)
                l10 = jnp.clip(ilm._rshift_round(logits, 7), -65535, 65535)
                l10 = jnp.clip((l10 * ks) >> 12, -(63 << ilm.ABITS),
                               (63 << ilm.ABITS))
                a = ilm._softmax_weights(l10, mask, lut["exp2"])
                attn = ilm._attention_out(a, kk.reshape(1, W + 1, H, hd))
                q = jnp.clip(attn, -ilm.MM_CLIP, ilm.MM_CLIP)
            return q, ()
        q, _ = jax.lax.scan(body, q, None, length=N_ITERS)
        return q
    t = timed(jax.jit(scan_attn), keys0, x0)
    print(f"attn (qk+sm+out):   {1e3 * t / N_ITERS:7.3f} ms/token", flush=True)

    # -- layernorms ------------------------------------------------------
    def scan_norm(sc, b, x):
        def body(x, _):
            for _i in range(3 * cfg.num_layers):
                x = ilm._layernorm(x, sc, b, d, lut["invsqrt"], *eps_kd) + 1
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x
    t = timed(jax.jit(scan_norm), iparams["norm_in"]["scale"],
              iparams["norm_in"]["bias"], x0)
    print(f"norm (15x):         {1e3 * t / N_ITERS:7.3f} ms/token", flush=True)

    # -- CDF head --------------------------------------------------------
    def scan_head(ip, x):
        def body(x, _):
            cdf = ilm._head_cdf(ip, exps, x[:, 0], K)
            nxt = x + (cdf[:, :1, 0] & 3)[:, None]
            return nxt, ()
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x
    t = timed(jax.jit(scan_head), iparams, x0)
    print(f"head (K-dot + cdf): {1e3 * t / N_ITERS:7.3f} ms/token", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
