"""On-chip probe: lmv=3 `.ecdc` machine portability, CPU <-> TPU.

The lmv=3 claim (stream/compress.py, models/ilm.py): the integer LM
produces bit-identical CDF rows on ANY backend, so a file written on one
machine decodes on any other. This probe runs BOTH directions against
the real TPU through the axon tunnel:

  1. compress the same wav on the CPU backend and on the TPU backend ->
     the two byte streams must be IDENTICAL (same codes via f32-HIGHEST
     RVQ on matched inputs is checked separately; here codes are
     extracted once on CPU and injected, isolating the entropy coder);
  2. decode the CPU-written stream on the TPU and the TPU-written stream
     on the CPU -> decoded codes must equal the originals (CRC-gated).

Also prints the float-LM (lmv=2) CDF-row divergence between the two
backends on the same inputs — the drift the integer design removes.

Run on the container with the tunnel up:  python probes/portable.py
"""

import io
import sys
import time

import numpy as np

t0 = time.time()
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

sys.path.insert(0, ".")

from encodec_tpu.models.lm import LMConfig, init_lm, LMModel  # noqa: E402
from encodec_tpu.models import ilm                            # noqa: E402
from encodec_tpu.models.model import build_model              # noqa: E402
import importlib                                              # noqa: E402
# (the package re-exports the `compress` FUNCTION under the module name)
cmod = importlib.import_module("encodec_tpu.stream.compress")


def main():
    devs = {d.platform: d for d in jax.devices()}
    cpu = jax.devices("cpu")[0]
    tpu = devs.get("axon") or devs.get("tpu")
    print(f"devices: cpu={cpu}, tpu={tpu} ({time.time()-t0:.0f}s)")
    if tpu is None:
        print("NO TPU VISIBLE — probe is CPU-only, exiting 2")
        return 2

    # full cardinality (the CDF head is the bitstream-critical part) but a
    # reduced trunk: the portability property is op-level, not
    # scale-dependent, and the full-size trunk costs ~9 min of XLA:CPU
    # compile+run per leg through this container's single core
    model = build_model([1.5, 3.0], sample_rate=24000, channels=1,
                        causal=True, model_norm="weight_norm",
                        name="encodec_24khz", ratios=[8, 5, 4, 2],
                        bins=1024, dimension=32, n_filters=4)
    model.set_target_bandwidth(3.0)
    reg = {model.name: (lambda pretrained=True: model)}
    cfg = LMConfig(n_q=model.cfg.rvq.n_q, card=1024, dim=64, num_heads=8,
                   num_layers=2, past_context=64)
    lm = LMModel(cfg, init_lm(jax.random.PRNGKey(1), cfg))
    wav = np.random.RandomState(3).randn(1, 12000).astype(np.float32) * 0.3

    # fix the codes once (CPU, f32 HIGHEST) and inject them, so the probe
    # isolates the ENTROPY CODER's portability from RVQ near-ties
    with jax.default_device(cpu):
        frames = model.encode(jnp.asarray(wav)[None])
        frames = [(jnp.asarray(np.asarray(f)), None if s is None else
                   jnp.asarray(np.asarray(s))) for f, s in frames]

    def compress_on(dev):
        with jax.default_device(dev):
            m2 = ilm.IntLMModel.from_lm(lm)
            m2._jit = {}          # force fresh executables on this backend
            lm2 = LMModel(lm.cfg, lm.params)
            lm2._int_model = m2
            fo = io.BytesIO()
            cmod.compress_to_file(model, wav, fo, use_lm=True, lm=lm2,
                                  models=reg, frames=frames)
            return fo.getvalue()

    def decompress_on(dev, data):
        lm2 = LMModel(lm.cfg, lm.params)   # fresh executable caches
        out, sr = cmod.decompress(data, device=dev, models=reg, lm=lm2)
        return np.asarray(out)

    print("compressing on CPU ...", flush=True)
    data_cpu = compress_on(cpu)
    print(f"  {len(data_cpu)} bytes ({time.time()-t0:.0f}s)")
    print("compressing on TPU ...", flush=True)
    data_tpu = compress_on(tpu)
    print(f"  {len(data_tpu)} bytes ({time.time()-t0:.0f}s)")
    same_bytes = data_cpu == data_tpu
    print(f"BYTE-IDENTICAL streams across backends: {same_bytes}")

    print("decoding CPU-written stream on TPU ...", flush=True)
    out_cross1 = decompress_on(tpu, data_cpu)
    print("decoding TPU-written stream on CPU ...", flush=True)
    out_cross2 = decompress_on(cpu, data_tpu)
    with jax.default_device(cpu):
        ref = np.asarray(model.decode(frames))[0, :, :wav.shape[-1]]
    ok1 = np.allclose(out_cross1, ref, atol=1e-5)
    ok2 = np.allclose(out_cross2, ref, atol=1e-5)
    print(f"CPU->TPU decode matches: {ok1}; TPU->CPU decode matches: {ok2}")

    # contrast: float-LM CDF rows across backends (the lmv=2 hazard)
    codes = np.asarray(frames[0][0][0])
    K, T = codes.shape
    shifted = np.zeros((1, K, 64), np.int32)
    shifted[0, :, 1:min(T, 64)] = 1 + codes[:, :min(T, 64) - 1]
    rows = {}
    for name, dev in (("cpu", cpu), ("tpu", tpu)):
        with jax.default_device(dev):
            lm2 = LMModel(lm.cfg, jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), lm.params))
            pr, _ = lm2.chunk_exec(1, K, 64)(
                lm2.params, jnp.asarray(shifted), lm2.init_stream(1))
            from encodec_tpu.stream.device_cdf import quantized_cdf_rows
            r, _bad = jax.jit(lambda p: quantized_cdf_rows(
                jnp.transpose(p, (0, 3, 2, 1))))(pr)
            rows[name] = np.asarray(r)
    ndiff = int((rows["cpu"] != rows["tpu"]).sum())
    print(f"float-LM (lmv=2) CDF-row integers differing CPU vs TPU: "
          f"{ndiff} / {rows['cpu'].size}")

    passed = same_bytes and ok1 and ok2
    print(f"PORTABLE PROBE {'PASS' if passed else 'FAIL'} "
          f"in {time.time()-t0:.0f}s")
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
