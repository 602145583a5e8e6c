"""encodec_tpu: a TPU-native (JAX/XLA/Pallas) neural audio codec framework.

Re-implements the full capability surface of the EnCodec codec family
(SEANet encoder/decoder, residual vector quantization, `.ecdc` bitstream with
arithmetic coding + streaming transformer LM, MS-STFT GAN training stack and
the breathing-signal fork extensions) as a from-scratch TPU-first design:

- channels-last `[B, T, C]` activations sized for the MXU,
- functional parameter pytrees (explicit state, `jit`/`pjit` friendly),
- `lax.scan` for sequential structure (LSTM, RVQ stages, streaming LM),
- sharding via `jax.sharding.Mesh` + NamedSharding for data parallelism,
- host-side bit-exact entropy coding decoupled from device compute.

Reference behavior: ellen660/encodec (fork of facebookresearch/encodec).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
