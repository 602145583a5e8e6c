"""Compress / decompress audio to `.ecdc` bytestreams.

Format parity with the reference (encodec/compress.py): same header
metadata and per-frame layout (optional big-endian f32 scale, then either
LSB-first packed codes or an arithmetic-coded stream driven by the LM).
Raw (no-LM) files interchange byte-for-byte with the reference tooling.

LM-coded streams come in two generations, marked "lmv" in the header:

* lmv=3 (default writer): MACHINE-PORTABLE. The entropy prior is the
  integer LM (`models.ilm`) — every op exact integer arithmetic, so any
  platform/executable reproduces the encoder's CDF rows bit-for-bit, the
  same cross-machine contract the reference's CDF roundoff targets (ref
  quantization/ac.py:18-53) but with a hard guarantee instead of a noise
  margin. The header also carries "cc", a CRC32 of the code frames, so
  stream corruption fails loudly instead of desynchronizing silently.
* lmv=2 (`portable=False`): pinned to this framework's compiled float-LM
  executable on the writing platform (see models/lm.py::lm_scan_chunk);
  decoded through the checksum-gated tier protocol below. Kept for
  byte-compatibility with round-3 streams.

TPU split: `model.encode` and — in LM mode — the teacher-forced LM sweep run
batched on the accelerator; only the byte-level packing / range coding loop
runs on the host. Decompression with the LM is inherently sequential
(code t conditions on decoded code t-1); lmv=3 decodes fully on device
(integer LM cell + range decoder in one scan per chunk, no verification
protocol needed), lmv=2 streams through the float tiers.
"""

from __future__ import annotations

import io
import math
import struct
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from . import binary
from .ac import ArithmeticCoder, ArithmeticDecoder

Array = np.ndarray  # annotation alias (decode paths return host arrays)


def _device_ctx(device):
    """`jax.default_device` context for an optional device spec: None (the
    default device), a `jax.Device`, or a platform string like 'cpu'."""
    if device is None:
        import contextlib
        return contextlib.nullcontext()
    dev = device if not isinstance(device, str) else jax.devices(device)[0]
    return jax.default_device(dev)


def _encode_lockstep_streams(lm, codes_list) -> tp.List[bytes]:
    """AC streams for independent code blocks/frames, teacher-forced in one
    batched lockstep sweep (`LMModel.codec_symbol_bounds_batched`)."""
    from .. import native
    bounds = lm.codec_symbol_bounds_batched(codes_list)
    streams = []
    for lows, highs in bounds:
        if native.available():
            streams.append(native.encode_bounds(lows, highs))
        else:
            buf = io.BytesIO()
            coder = ArithmeticCoder(buf)
            for lo_i, hi_i in zip(lows, highs):
                coder.push_bounds(int(lo_i), int(hi_i))
            coder.flush()
            streams.append(buf.getvalue())
    return streams


# Default lm_restart block length for single-frame LM streams when the
# caller asks for "auto" (the CLI default): the knee of the measured
# rate-cost-vs-R curve (probes/lm_restart_rate.py — a trained prior at
# 4.59 bits/code pays 0.37% at R=375, 0.22% at 750, 0.67% at 188)
# against the lockstep decode-rate-vs-lanes curve
# (probes/ilm_lockstep.py — 0.772 ms/token at S=1 flattening to 0.241
# by S=16). R=375 (5 s of tokens at 75 Hz) puts a 60 s file on 12
# lanes, inside the flat part of the decode curve, for <0.4% rate.
DEFAULT_LM_RESTART = 375


def _resolve_lm_restart(lm_restart, use_lm: bool, model):
    """'auto' -> DEFAULT_LM_RESTART on single-frame LM streams, None
    otherwise (segmented models already entropy-code segments
    independently; raw streams carry no LM blocks)."""
    if lm_restart != "auto":
        return lm_restart
    if use_lm and model.segment_length is None:
        return DEFAULT_LM_RESTART
    return None


def compress_to_file(model, wav, fo: tp.IO[bytes], use_lm: bool = False,
                     lm=None, models=None,
                     lm_restart: tp.Union[int, str, None] = None,
                     frames=None, portable: bool = True,
                     tie_guard: bool = True) -> None:
    """Compress a `[C, T]` waveform to a file object.

    `model` is an `encodec_tpu.models.EncodecModel` with a target bandwidth
    set. With `use_lm`, `lm` may be passed explicitly (otherwise the
    pretrained LM for the model is loaded, which requires the checkpoint).
    `models` overrides the name registry used for validation.

    `portable` (default) entropy-codes with the integer LM derived from
    `lm` — the stream (lmv=3) decodes bit-exactly on ANY machine/backend
    and carries a CRC of the code frames. `portable=False` writes the
    round-3 lmv=2 format, pinned to this framework's float-LM executable
    on the writing platform (see module docstring).

    `tie_guard` (default, VERDICT r3 #3): encode through the near-tie
    guard (`EncodecModel.encode_guarded`) — RVQ argmin positions whose
    top-2 distance gap is razor-thin (the regime real trained weights
    live in: PARITY_REPORT.json trained_weights, min margin 5.2e-6) are
    re-resolved on host in f64 with the reference association order.
    Writers whose encoder latents agree (same precision mode, any
    executable/platform-level matmul reassociation) emit identical
    codes; across precision MODES the latents themselves drift, so
    byte-identity with the 'highest' parity writer is exact for
    'highest', holds to a measured ~0.1% floor for 'high' on
    near-exact-tie trained codebooks, and is unattainable for 'fast'
    (probes/fast_writer.py; refused below). Per-file margin statistics
    are logged. Ignored when the caller injects `frames` (the codes are
    then the caller's contract).

    `lm_restart=R` (single-frame LM streams, e.g. the 24 kHz model) resets
    the LM state every R tokens and entropy-codes the blocks independently
    — slightly worse compression (the prior loses its context at block
    starts) in exchange for block-PARALLEL decoding: all blocks decode in
    lockstep through one batched executable, cutting the decoder's
    per-token device round-trips by the block count. `"auto"` (the CLI
    default) selects `DEFAULT_LM_RESTART` on single-frame LM streams and
    None otherwise — the measured knee of rate cost vs decode
    parallelism (probes/lm_restart_rate.py).

    `frames` optionally supplies the `model.encode(wav[None])` result the
    caller already computed — the seam `tools.batch.compress_directory`
    uses to encode every file of a sweep through a handful of SHARED
    streaming executables instead of one fresh XLA compile per distinct
    file length. The caller must guarantee the frames equal
    `model.encode`'s output (the streaming extractor is bit-exact by
    construction and test); the written bytes are identical either way.
    """
    from ..models.model import MODELS

    assert np.ndim(wav) == 2, "Only a single waveform can be encoded."
    registry = models if models is not None else MODELS
    if model.name not in registry:
        raise ValueError(f"The provided model {model.name} is not supported.")
    lm_restart = _resolve_lm_restart(lm_restart, use_lm, model)
    # cheap argument validation BEFORE any device work / checkpoint load
    if lm_restart and not use_lm:
        raise ValueError(
            "lm_restart only affects LM entropy coding — pass use_lm=True "
            "(CLI: --lm) or drop lm_restart.")
    if lm_restart and model.segment_length is not None:
        raise ValueError(
            "lm_restart applies to single-frame streams (e.g. the 24 kHz "
            "model); segmented models already entropy-code every segment "
            "independently and decode them in parallel.")

    # .ecdc files must be bitstream-reproducible: the Pallas search
    # backends match the XLA parity path except on EXACT distance ties,
    # where last-ulp cross-executable float differences can flip the
    # chosen index (kernels/vq_pallas.py caveat). Refuse to write a
    # container with a tie-unsafe backend active rather than silently
    # producing files another process may not reproduce.
    from ..quant import rvq as _rvq
    if _rvq._NEAREST_IMPL != "xla":
        raise RuntimeError(
            f"refusing to write .ecdc with nearest-neighbor backend "
            f"'{_rvq._NEAREST_IMPL}': only the 'xla' path is "
            f"bitstream-reproducible across executables. Call "
            f"encodec_tpu.quant.set_nearest_impl('xla') around "
            f"compression; the Pallas kernels are serving-latency "
            f"opt-ins for code extraction, not container writing.")
    # Same contract for MXU matmul precision: 'fast' (single-pass bf16)
    # is refused on MEASURED grounds (probes/fast_writer.py, on-chip):
    # its encoder latents drift at bf16 scale, flipping 28-45/~1900
    # codes vs the parity writer on full-size and trained models at
    # EVERY guard threshold up to 1e-1 — the tie guard re-resolves from
    # the writer's own latents, so latent drift is invisible to it and
    # no threshold certifies 'fast'. 'high' (3-pass bf16) is allowed:
    # guarded at the mode-matched threshold below, it measured 0 flips
    # on the full-size models; on trained near-exact-tie codebooks a
    # ~0.1% residual floor remains (2/1920 positions whose f64 margin
    # sits below the 'high' latent drift ~1e-6). The container stays
    # fully self-consistent either way (codes are just codes); only
    # byte-identity with a 'highest' writer is at stake.
    if model._precision == jax.lax.Precision.DEFAULT:
        raise RuntimeError(
            "refusing to write .ecdc at set_precision('fast'): single-pass "
            "bf16 drifts the encoder latents themselves, which the "
            "near-tie guard cannot see (measured 28-45/~1900 code flips "
            "vs the parity writer at every threshold; "
            "probes/fast_writer.py). Use 'highest' (parity default) or "
            "'high' (guarded, ~1.5x faster).")
    if model._precision == jax.lax.Precision.HIGH and not (
            tie_guard and frames is None):
        import logging
        logging.getLogger(__name__).warning(
            "writing .ecdc at set_precision('high') WITHOUT the near-tie "
            "guard: audited flip-free at served bandwidths on the "
            "full-size models, but not the bit-exact parity path "
            "('highest'). The default tie_guard=True path guards 'high' "
            "at its mode-matched threshold (residual floor ~0.1% only on "
            "near-exact-tie trained codebooks; probes/fast_writer.py).")

    if use_lm and lm is None:
        from ..models.lm import get_lm_model
        lm = get_lm_model(model)
    coder_lm = lm
    if use_lm and portable:
        from ..models.ilm import IntLMModel
        coder_lm = IntLMModel.from_lm(lm)

    if frames is None:
        if tie_guard:
            # mode-matched guard threshold: 'highest' writers only need
            # to cover cross-executable distance drift (~1e-7 — 1e-3
            # gives 100x headroom); 'high' writers additionally carry
            # encoder-latent drift that shifts distances up to ~1e-3 on
            # the full-size models (probes/fast_writer.py measured one
            # unflagged 48 kHz flip at threshold 1e-3, zero at 1e-2),
            # so they flag the wider band
            thr = (1e-2 if model._precision == jax.lax.Precision.HIGH
                   else 1e-3)
            frames, tie_stats = model.encode_guarded(
                jnp.asarray(wav)[None], threshold=thr)
            import logging
            logging.getLogger(__name__).log(
                (logging.INFO if tie_stats["n_flagged"] else logging.DEBUG),
                "tie guard: min RVQ argmin margin %.3g over %d positions; "
                "%d flagged (< threshold), %d re-resolved in f64",
                tie_stats["min_margin"], tie_stats["n_positions"],
                tie_stats["n_flagged"], tie_stats["n_changed"])
        else:
            frames = model.encode(jnp.asarray(wav)[None])

    metadata = {
        "m": model.name,
        "al": int(np.shape(wav)[-1]),
        "nc": int(frames[0][0].shape[1]),
        "lm": use_lm,
    }
    if use_lm:
        # LM codec generation marker (see module docstring): 3 = portable
        # integer LM + frame-codes CRC; 2 = pinned float-LM chunk-scan +
        # device CDFs. Readers refuse unknown generations loudly instead
        # of desynchronizing the range decoder silently. Raw streams
        # carry no marker — their format is unchanged from the reference.
        if portable:
            from ..models.ilm import codes_checksum
            metadata["lmv"] = 3
            metadata["cc"] = codes_checksum(
                np.asarray(f[0][0]) for f in frames)
        else:
            metadata["lmv"] = 2

    if use_lm and len(frames) > 1:
        # Multi-segment LM fast path: all segments' teacher-forced sweeps
        # run in LOCKSTEP through one [S, K, C] chunk executable (fresh LM
        # state per frame, so batching changes nothing semantically), and
        # the header records each frame's AC byte length ("fl") so the
        # decoder can batch its per-token re-runs the same way. The raw
        # (no-LM) layout and single-frame LM layout are unchanged.
        codes_list = [np.asarray(f[0][0]) for f in frames]   # [K, T] each
        streams = _encode_lockstep_streams(coder_lm, codes_list)
        metadata["fl"] = [len(s) for s in streams]
        binary.write_ecdc_header(fo, metadata)
        for (frame, scale), stream in zip(frames, streams):
            if scale is not None:
                fo.write(struct.pack(
                    "!f", float(np.asarray(scale).reshape(-1)[0])))
            fo.write(stream)
        return

    if use_lm and lm_restart and len(frames) == 1:
        codes = np.asarray(frames[0][0][0])                  # [K, T]
        R = int(lm_restart)
        blocks = [codes[:, i:i + R] for i in range(0, codes.shape[1], R)]
        streams = _encode_lockstep_streams(coder_lm, blocks)
        metadata["lmb"] = R
        metadata["fl"] = [len(s) for s in streams]
        binary.write_ecdc_header(fo, metadata)
        scale = frames[0][1]
        if scale is not None:
            fo.write(struct.pack("!f",
                                 float(np.asarray(scale).reshape(-1)[0])))
        for stream in streams:
            fo.write(stream)
        return

    binary.write_ecdc_header(fo, metadata)

    for (frame, scale) in frames:
        if scale is not None:
            fo.write(struct.pack("!f", float(np.asarray(scale).reshape(-1)[0])))
        codes = np.asarray(frame[0])            # [K, T]
        K, T = codes.shape
        if not use_lm:
            # vectorized fast path: (t, k) interleave order, one pack call
            fo.write(binary.pack_bits(codes.T, model.bits_per_codebook))
            continue
        # Teacher-forced sweep through the pinned chunk executable that the
        # decoder re-runs (`lm_scan_chunk`): ceil(T/C) device dispatches per
        # frame instead of a host loop with a tunnel round-trip per token.
        # Encode/decode CDFs must match bit-for-bit, and only a single
        # shared compiled function guarantees identical float32
        # probabilities — the batched full-attention evaluation differs at
        # ~1e-6 and a separately-compiled single step at ~1e-7, both above
        # the 1e-8 CDF roundoff. The quantized CDFs are also built on
        # device (`stream.device_cdf`), so only the [T, K] per-symbol coder
        # bounds ever cross the wire; the range-coding loop runs in the
        # native (C++) backend when available.
        lows, highs = coder_lm.codec_symbol_bounds(codes)  # (t, k) order
        from .. import native
        if native.available():
            fo.write(native.encode_bounds(lows, highs))
        else:
            coder = ArithmeticCoder(fo)
            for i in range(T * K):
                coder.push_bounds(int(lows[i]), int(highs[i]))
            coder.flush()


def decompress_from_file(fo: tp.IO[bytes], device=None, models=None, lm=None,
                         repository: tp.Optional[str] = None,
                         decode=None):
    """Decompress a `.ecdc` stream → `(wav [C, T], sample_rate)`.

    `models` optionally overrides the pretrained registry (name → factory),
    e.g. for locally-trained models; `lm` injects an LM instance instead of
    loading the pretrained one, and `repository` loads the pretrained LM
    from a local directory (offline mode) when the stream is LM-coded.
    `device` (a `jax.Device` or a platform string like 'cpu') pins the
    decode's device placement — the reference signature's torch `device`
    argument, honored via `jax.default_device`.
    """
    with _device_ctx(device):
        return _decompress_from_file_impl(fo, models=models, lm=lm,
                                          repository=repository,
                                          decode=decode)


def _decompress_from_file_impl(fo: tp.IO[bytes], models=None, lm=None,
                               repository=None, decode=None):
    # `decode` optionally replaces `model.decode(frames)` — the seam
    # `tools.batch.decompress_directory` uses to decode every file of a
    # sweep through bucketed SHARED executables (pad codes to a power-of-
    # two length, trim the audio; exact for causal models by causality)
    # instead of one fresh XLA compile per distinct frame count.
    from ..models.model import MODELS

    metadata = binary.read_ecdc_header(fo)
    model_name = metadata["m"]
    audio_length = metadata["al"]
    num_codebooks = metadata["nc"]
    use_lm = metadata["lm"]
    assert isinstance(audio_length, int)
    assert isinstance(num_codebooks, int)
    registry = models if models is not None else MODELS
    if model_name not in registry:
        raise ValueError(
            f"The audio was compressed with an unsupported model {model_name}.")
    model = registry[model_name](pretrained=True)

    if use_lm and lm is None:
        from ..models.lm import get_lm_model
        lm = get_lm_model(model, repository=repository)

    if use_lm and metadata.get("lmv") not in (2, 3):
        raise ValueError(
            "This LM-coded .ecdc stream was written by an older encoder "
            "generation (no/unknown 'lmv' marker); its CDFs are not "
            "reproducible by this decoder. Re-encode with the current "
            "writer, or decode raw (no-LM) streams which are unaffected.")

    # lmv=3: portable integer-LM streams. One lockstep decoder (any
    # executable reproduces the CDFs — integer arithmetic), plus a CRC
    # gate over the reconstructed code frames ("cc").
    if use_lm and metadata.get("lmv") == 3:
        from ..models.ilm import IntLMModel, codes_checksum
        ilm = IntLMModel.from_lm(lm)
        expected_cc = metadata.get("cc")

        def lockstep(datas, K, Ts):
            return _lockstep_decode_int(datas, ilm, K, Ts)

        def verify_codes(frame_codes):
            if expected_cc is None:
                return
            got = codes_checksum(frame_codes)
            if got != expected_cc:
                raise ValueError(
                    f"lmv=3 code checksum mismatch (got {got:#x}, header "
                    f"says {expected_cc:#x}) — corrupt stream or decoder "
                    "bug; refusing to emit audio.")
    else:
        def lockstep(datas, K, Ts):
            return _lockstep_decode(datas, lm, K, Ts)

        def verify_codes(frame_codes):
            return

    frame_lengths = metadata.get("fl")
    decode = decode or model.decode
    if use_lm and frame_lengths and metadata.get("lmb"):
        return _decompress_lm_restart(fo, model, lockstep, num_codebooks,
                                      audio_length, frame_lengths,
                                      int(metadata["lmb"]), decode=decode,
                                      verify_codes=verify_codes)
    if use_lm and frame_lengths:
        return _decompress_lm_indexed(fo, model, lockstep, num_codebooks,
                                      audio_length, frame_lengths,
                                      decode=decode,
                                      verify_codes=verify_codes)

    frames = []
    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    offsets = list(range(0, audio_length, segment_stride))
    if use_lm and len(offsets) > 1:
        # our writer always records the per-frame byte index ("fl") for
        # multi-segment LM files (handled above); a multi-segment LM file
        # without it has concatenated AC streams of unknown lengths, which
        # cannot be re-sliced — fail with a real explanation instead of a
        # confusing EOF mid-stream
        raise ValueError(
            "multi-segment LM-coded stream without a frame index ('fl') — "
            "not a layout this writer produces; re-encode the file.")
    for offset in offsets:
        this_segment_length = min(audio_length - offset, segment_length)
        frame_length = int(math.ceil(
            this_segment_length * model.frame_rate / model.sample_rate))
        if model.normalize:
            scale_f, = struct.unpack(
                "!f", binary._read_exactly(fo, struct.calcsize("!f")))
            scale = jnp.full((1, 1), scale_f, jnp.float32)
        else:
            scale = None
        if use_lm and metadata.get("lmv") == 3:
            codes = lockstep([fo.read()], num_codebooks, [frame_length])[
                0, :, :frame_length]
            verify_codes([codes])
        elif use_lm:
            codes = _decode_frame_lm(fo, lm, num_codebooks, frame_length)
        else:
            nbytes = (frame_length * num_codebooks * model.bits_per_codebook + 7) // 8
            data = binary._read_exactly(fo, nbytes)
            vals = binary.unpack_bits(data, model.bits_per_codebook,
                                      count=frame_length * num_codebooks)
            codes = vals.reshape(frame_length, num_codebooks).T  # [K, T]
        frames.append((jnp.asarray(codes.astype(np.int32))[None], scale))
    wav = decode(frames)
    return wav[0, :, :audio_length], model.sample_rate


class LMScheduleMismatch(RuntimeError):
    """A fast decode tier's quantized CDF rows did not reproduce the
    encoder's chunk-executable rows on this platform — detected by the
    per-chunk row-checksum self-check BEFORE any output is accepted.
    Callers fall back to the next (ultimately same-executable) tier."""


def _make_decoder(data: bytes):
    from .. import native
    if native.available():
        return native.StreamingDecoder(data)
    return ArithmeticDecoder(io.BytesIO(data))


def _decode_frame_lm(fo, lm, K: int, T: int) -> np.ndarray:
    """AC decode of one frame. The frame's stream is the remainder of `fo`
    (our writer emits single-frame layouts only when there is exactly one
    segment), buffered so a self-check failure can transparently retry.

    Three tiers, each verified before its output is accepted, each falling
    back to the next on a CDF-row-checksum mismatch: fully-on-device fused
    LM+AC scan (~1 dispatch/chunk), host AC fed by the pinned pair
    executable (~1.5 round-trips/token), same-executable re-runs (slow,
    trivially exact)."""
    data = fo.read()
    try:
        return _decode_frame_lm_device(data, lm, K, T)
    except LMScheduleMismatch:
        import logging
        logging.getLogger(__name__).warning(
            "fused device LM decode self-check failed (its executable did "
            "not reproduce the encoder's quantized CDF rows on this "
            "platform); retrying with the pair-executable decoder")
    try:
        return _decode_frame_lm_fast(data, lm, K, T)
    except LMScheduleMismatch:
        import logging
        logging.getLogger(__name__).warning(
            "LM decode self-check failed (pinned pair executable did not "
            "reproduce the chunk executable's quantized CDF rows on this "
            "platform); retrying with the same-executable decoder")
        return _decode_frame_lm_safe(data, lm, K, T)


def _decode_frame_lm_device(data: bytes, lm, K: int, T: int) -> np.ndarray:
    """Fully-on-device LM decompression: the LM cell, CDF quantization and
    the range decoder all run inside one scan, one dispatch per 256-token
    chunk, carries chained device-to-device (`models.lm.
    fused_decode_chunk_exec`). The only host materializations are the final
    codes + flags + checksums — per-token cost is the LM cell itself, not a
    tunnel round-trip.

    Verification (trust nothing): per-position checksums of the quantized
    CDF ROWS the fused executable decoded with must equal checksums of the
    rows derived from ONE teacher-forced re-run of the encoder's own
    pinned chunk executable over the *decoded* codes. Row equality proves
    the decoder pulled symbols from exactly the CDFs whose bounds the
    encoder wrote — hence (the integer AC being exact) the exact symbol
    stream; ulp-level probability drift that changes no row stays on this
    tier. Any mismatch raises `LMScheduleMismatch` BEFORE output escapes
    and the caller falls back. EOF/validity flags are honored only after
    checksum verification, since a diverged decode makes them meaningless.
    """
    codes = _fused_device_decode([data], lm, K, [T])[0]  # [K, T]
    return codes.astype(np.int64)


def _fused_device_decode(datas, lm, K: int, Ts) -> np.ndarray:
    """Shared device decode core for S lockstep streams (S=1 for the
    single-frame layout). Returns verified codes `[S, K, T_max]` (int64,
    ragged tails zero) or raises (`LMScheduleMismatch` → caller falls
    back; EOF/ValueError/RuntimeError mirror the host decoder's errors)."""
    from . import device_ac

    S = len(datas)
    T_max = max(Ts)
    chunk = lm.CODEC_CHUNK
    exec_ = lm.fused_decode_chunk_exec()
    big_exec = lm.chunk_exec(S, K, chunk)
    # one checksum executable for every S: the S=1 row flatten [C, 1·K·card]
    # sums the same elements with the same odd weights in the same order
    # as the unbatched [C, K·card] form — bit-identical integer sums
    cs_exec = lm.batch_chunk_checksum_exec()

    # bucket the buffer shape so one executable serves all stream lengths
    max_len = max(len(d) for d in datas)
    bucket = max_len + (-max_len % 8192 or 8192)
    buf = jnp.asarray(np.stack([
        np.frombuffer(d + b"\x00" * (bucket - len(d)), np.uint8)
        for d in datas]))
    nbits = jnp.asarray([8 * len(d) for d in datas], jnp.int32)
    ts = jnp.asarray(Ts, jnp.int32)

    state = lm.init_stream(batch=S)
    ac = device_ac.init_state(batch=S)
    prev = jnp.zeros((S, K), jnp.int32)
    n_chunks = -(-T_max // chunk)
    outs = []
    for c in range(n_chunks):
        t0 = jnp.asarray(c * chunk, jnp.int32)
        syms, cs, bad, ok, eof, state, ac, prev = exec_(
            lm.params, state, ac, buf, nbits, prev, ts, t0)
        outs.append((syms, cs, bad, ok, eof))  # device arrays — no sync yet

    # concatenate chunk outputs ON DEVICE, one host transfer per field
    # (per-chunk np.asarray would pay one blocking round-trip per chunk per
    # field through a tunneled deployment)
    cat = (list(outs[0]) if len(outs) == 1 else
           [jnp.concatenate([o[i] for o in outs]) for i in range(5)])
    # [T_max, S, K] -> [S, K, T_max]
    syms_all = np.asarray(cat[0])[:T_max]
    codes = np.moveaxis(syms_all, 0, -1).astype(np.int64)
    cs_dev = np.asarray(cat[1])
    bad = np.asarray(cat[2])[:T_max]
    okf = np.asarray(cat[3])[:T_max]
    eof = np.asarray(cat[4])[:T_max]

    # canonical verification: the encoder's own chunk-executable chain over
    # the decoded codes must yield the SAME quantized CDF rows
    # (row equality => the exact AC decode; see fused_decode_chunk_exec
    # docstring)
    vstate = lm.init_stream(batch=S)
    cs_ref = []
    for c in range(n_chunks):
        lo, hi = c * chunk, min(T_max, c * chunk + chunk)
        # FRESH buffer every chunk — `jnp.asarray` of a contiguous numpy
        # array zero-copy ALIASES its memory on the CPU backend, and this
        # loop deliberately never syncs (the appended checksums stay on
        # device); reusing one buffer here mutated it while the previous
        # chunk's still-executing `big_exec` read it, silently corrupting
        # cs_ref under load (the root cause of the order-dependent
        # primary-tier demotions previously attributed to compilation-cache
        # staleness; see tests/test_device_ac.py history)
        shifted = np.zeros((S, K, chunk), np.int32)
        for s in range(S):
            # active positions (t < Ts[s], t > 0) feed 1+previous code;
            # finished lanes feed 0 — the encoder's lockstep padding
            # (codec_symbol_bounds_batched)
            t_lo = max(lo, 1)
            t_hi = min(hi, Ts[s])
            if t_hi > t_lo:
                shifted[s, :, t_lo - lo:t_hi - lo] = \
                    1 + codes[s, :, t_lo - 1:t_hi - 1]
        pr, vstate = big_exec(lm.params, jnp.asarray(shifted), vstate)
        cs_ref.append(cs_exec(pr)[:hi - lo])  # device array — no sync yet
    cs_ref_all = np.asarray(cs_ref[0] if len(cs_ref) == 1
                            else jnp.concatenate(cs_ref))
    n_valid = len(cs_ref_all)
    if not np.array_equal(cs_ref_all, cs_dev[:n_valid]):
        bad_pos = np.nonzero(cs_ref_all != cs_dev[:n_valid])[0]
        raise LMScheduleMismatch(
            "fused device decoder CDF rows diverged from the chunk "
            f"executable's at {bad_pos.size}/{n_valid} positions "
            f"(first: {bad_pos[:5].tolist()})")
    if eof.any():
        raise EOFError("The stream ended sooner than expected.")
    if bad.any():
        raise ValueError("You must increase your total_range_bits.")
    if not okf.all():
        raise RuntimeError("Binary search failed")
    return codes


def _decode_frame_lm_fast(data: bytes, lm, K: int, T: int) -> np.ndarray:
    """Cost-bounded sequential AC decode: ~2 transformer cells per token.

    Decoding is inherently per-token (code t conditions on decoded code
    t-1) and the probabilities must BIT-match the encoder's, which came
    from the pinned `CODEC_CHUNK`-token `lm_scan_chunk` executable. The
    old approach re-ran that full executable per token (O(chunk) cells
    per token). This path exploits a measured XLA property: `lax.scan`
    executables whose bodies are identical produce bit-identical per-step
    results regardless of trip count (the body compiles to its own
    while-loop computation; only trip-count-1 scans get unrolled and
    diverge). So each token runs a pinned TWO-step executable — run 1
    feeds [token, 0] and reads position 0 (exact by scan causality),
    run 2 feeds the completed pair and advances the pair-chained state —
    2 cells per token instead of `chunk`.

    Trust is NOT assumed: after each chunk, ONE re-run of the encoder's
    own chunk executable (from the encoder's state chain, whose output
    also seeds the next chunk) produces per-position checksums of the
    quantized CDF rows that must equal the per-token row checksums the
    pair-executable path decoded with. Any platform where the trip-count
    property fails BY ENOUGH TO CHANGE A ROW is detected at the first
    diverging token's chunk and `LMScheduleMismatch` aborts the fast path
    before any output escapes (sub-quantization ulp drift keeps this tier
    live — row equality is exactly what byte-correct decoding needs); odd
    weighting makes single-element row differences always detectable
    (`models/lm.py:bits_checksum`).
    Amortized cost: 2 + chunk/chunk ≈ 3 cells per token, within the ~4×
    -of-encode bound (encode: 1 cell + bounds per token). Ref:
    compress.py:126-152 pays one CPU cell per token — this matches its
    asymptotics on TPU while keeping device dispatch per token O(1).

    Implementation: the batched lockstep core with a length-1 batch —
    one copy of the checksum-critical protocol, not two that must be
    kept bit-for-bit in sync by hand. The S=1 executables it picks
    (`chunk_exec(1, K, ...)`) are exactly the ones the single-frame
    encoder used.
    """
    return _lockstep_decode_fast([data], lm, K, [T])[0]


def _decode_frame_lm_safe(data: bytes, lm, K: int, T: int) -> np.ndarray:
    """Same-executable sequential AC decode (the correctness anchor).

    For each token the *same* compiled chunk scan the encoder used re-runs
    over the decoded prefix of the current chunk (zeros beyond — causality
    makes `probas[..., t]` exact) from the chunk-boundary stream state; the
    run that decodes a chunk's final token is fully fed and its output
    state seeds the next chunk. O(T·chunk) device cells — the fallback for
    platforms where the fast path's trip-count property fails.

    Implementation: the batched lockstep core with a length-1 batch (see
    `_decode_frame_lm_fast`).
    """
    return _lockstep_decode_safe([data], lm, K, [T])[0]


def _decompress_lm_indexed(fo, model, lockstep, K: int, audio_length: int,
                           frame_lengths, decode=None,
                           verify_codes=lambda fc: None
                           ) -> tp.Tuple[Array, int]:
    """Decode an "fl"-indexed multi-segment LM file: every segment's AC
    stream is sliced out by its recorded byte length and all segments are
    decoded in LOCKSTEP through one batched executable — S× fewer device
    round-trips than sequential per-segment decoding. `lockstep` is the
    generation-appropriate decoder (float tiers for lmv=2, integer fused
    scan for lmv=3); `verify_codes` gates the lmv=3 CRC."""
    segment_length = model.segment_length or audio_length
    segment_stride = model.segment_stride or audio_length
    offsets = list(range(0, audio_length, segment_stride))
    assert len(offsets) == len(frame_lengths), (len(offsets), frame_lengths)
    scales, datas, Ts = [], [], []
    for offset, nbytes in zip(offsets, frame_lengths):
        if model.normalize:
            scale_f, = struct.unpack(
                "!f", binary._read_exactly(fo, struct.calcsize("!f")))
            scales.append(jnp.full((1, 1), scale_f, jnp.float32))
        else:
            scales.append(None)
        this_len = min(audio_length - offset, segment_length)
        Ts.append(int(math.ceil(
            this_len * model.frame_rate / model.sample_rate)))
        datas.append(binary._read_exactly(fo, nbytes))

    codes = lockstep(datas, K, Ts)
    verify_codes([codes[s, :, :Ts[s]] for s in range(len(datas))])
    frames = [(jnp.asarray(codes[s, :, :Ts[s]].astype(np.int32))[None],
               scales[s]) for s in range(len(datas))]
    wav = (decode or model.decode)(frames)
    return wav[0, :, :audio_length], model.sample_rate


def _lockstep_decode(datas, lm, K: int, Ts) -> "np.ndarray":
    """Advance S independent AC streams (raw byte blobs) in lockstep.
    Tiered like `_decode_frame_lm`: fully-on-device fused LM+AC scan, then
    the pair-executable host path, then same-executable re-runs — each
    verified against the encoder's chunk executable before its output is
    accepted (fresh decoders are rebuilt from the byte blobs on
    fallback). Returns codes `[S, K, max(Ts)]` (ragged tails zero)."""
    try:
        return _fused_device_decode(datas, lm, K, Ts)
    except LMScheduleMismatch:
        import logging
        logging.getLogger(__name__).warning(
            "fused device LM lockstep decode self-check failed; retrying "
            "with the pair-executable decoder")
    try:
        return _lockstep_decode_fast(datas, lm, K, Ts)
    except LMScheduleMismatch:
        import logging
        logging.getLogger(__name__).warning(
            "LM lockstep decode self-check failed; retrying with the "
            "same-executable decoder")
        return _lockstep_decode_safe(datas, lm, K, Ts)


def _lockstep_pull(decoders, rows_exec, probas, p, codes, t, K, Ts,
                   cs_seen) -> None:
    """Pull token row t for every still-active stream from device-built
    CDF rows at pair position `p`; records the row checksum."""
    rows, bad, cs = rows_exec(probas, p)
    if bool(np.asarray(bad)):
        raise ValueError("You must increase your total_range_bits.")
    cdfs = np.asarray(rows, np.int64)
    cs_seen.append(np.asarray(cs))
    for s in range(len(decoders)):
        if t >= Ts[s]:
            continue
        for k in range(K):
            code = decoders[s].pull(cdfs[s, k])
            if code is None:
                raise EOFError("The stream ended sooner than expected.")
            codes[s, k, t] = code


def _lockstep_decode_fast(datas, lm, K: int, Ts) -> "np.ndarray":
    """Batched variant of `_decode_frame_lm_fast`: every token costs one
    run of the pinned `[S, K, 2]` pair executable (2 cells) and chunk
    boundaries re-run the encoder's `[S, K, chunk]` executable once — for
    the state chain AND the per-position CDF-row checksums that gate
    the output (see `_decode_frame_lm_fast` for the full argument)."""
    S = len(datas)
    decoders = [_make_decoder(d) for d in datas]
    T_max = max(Ts)
    chunk = lm.CODEC_CHUNK
    pair_exec = lm.chunk_exec(S, K, 2)
    rows_exec = lm.batch_cdf_row_exec()
    big_exec = lm.chunk_exec(S, K, chunk)
    cs_exec = lm.batch_chunk_checksum_exec()
    state = lm.init_stream(batch=S)
    codes = np.zeros((S, K, T_max), np.int64)
    shifted = np.zeros((S, K, chunk), np.int32)
    pair_in = np.zeros((S, K, 2), np.int32)

    def fill(t, lo):
        # finished streams were padded with 0 at encode time
        # (lm.codec_symbol_bounds_batched); reproduce those inputs exactly
        for s in range(S):
            if t < Ts[s]:
                shifted[s, :, t - lo] = 1 + codes[s, :, t - 1]

    for c in range(-(-T_max // chunk)):
        lo = c * chunk
        hi = min(T_max, lo + chunk)
        chunk_state = state
        shifted[:] = 0
        if c > 0:
            fill(lo, lo)
        cs_seen = []
        pstate = state
        for t0 in range(lo, hi, 2):
            pair_in[:] = 0
            pair_in[:, :, 0] = shifted[:, :, t0 - lo]
            probas, _ = pair_exec(lm.params, jnp.asarray(pair_in), pstate)
            _lockstep_pull(decoders, rows_exec, probas, 0, codes, t0, K, Ts,
                           cs_seen)
            if t0 + 1 - lo < chunk:
                fill(t0 + 1, lo)
            if t0 + 1 < hi:
                pair_in[:, :, 1] = shifted[:, :, t0 + 1 - lo]
                probas, pstate = pair_exec(lm.params, jnp.asarray(pair_in),
                                           pstate)
                _lockstep_pull(decoders, rows_exec, probas, 1, codes,
                               t0 + 1, K, Ts, cs_seen)
                if t0 + 2 - lo < chunk:
                    fill(t0 + 2, lo)
        pr_all, state = big_exec(lm.params, jnp.asarray(shifted), chunk_state)
        cs_ref = np.asarray(cs_exec(pr_all))
        if not np.array_equal(cs_ref[:hi - lo],
                              np.asarray(cs_seen, np.int32)):
            raise LMScheduleMismatch(
                "pair-executable CDF rows diverged from the chunk "
                f"executable's in tokens [{lo}, {hi})")
    return codes


def _lockstep_decode_safe(datas, lm, K: int, Ts) -> "np.ndarray":
    """Same-executable lockstep decode: per token, re-run the encoder's
    `[S, K, chunk]` executable over the decoded prefix (the correctness
    anchor; O(T·chunk) cells)."""
    decoders = [_make_decoder(d) for d in datas]
    S = len(decoders)
    T_max = max(Ts)
    chunk = lm.CODEC_CHUNK
    exec_ = lm.chunk_exec(S, K, chunk)
    rows_exec = lm.batch_cdf_row_exec()
    state = lm.init_stream(batch=S)
    codes = np.zeros((S, K, T_max), np.int64)
    shifted = np.zeros((S, K, chunk), np.int32)
    for c in range(-(-T_max // chunk)):
        lo = c * chunk
        hi = min(T_max, lo + chunk)
        shifted[:] = 0
        if c > 0:
            for s in range(S):
                if lo < Ts[s]:
                    shifted[s, :, 0] = 1 + codes[s, :, lo - 1]
        last_state = None
        for t in range(lo, hi):
            probas, out_state = exec_(lm.params, jnp.asarray(shifted), state)
            last_state = out_state
            rows, bad, _cs = rows_exec(probas, t - lo)  # [S, K, card] int32
            if bool(np.asarray(bad)):
                raise ValueError("You must increase your total_range_bits.")
            cdfs = np.asarray(rows, np.int64)
            for s in range(S):
                if t >= Ts[s]:
                    continue
                for k in range(K):
                    code = decoders[s].pull(cdfs[s, k])
                    if code is None:
                        raise EOFError(
                            "The stream ended sooner than expected.")
                    codes[s, k, t] = code
            if t + 1 < hi:
                for s in range(S):
                    if t + 1 < Ts[s]:
                        shifted[s, :, t + 1 - lo] = 1 + codes[s, :, t]
        state = last_state
    return codes


def _lockstep_decode_int(datas, ilm, K: int, Ts) -> "np.ndarray":
    """Advance S independent AC streams in lockstep through the INTEGER
    LM's fused device decoder (`models.ilm.IntLMModel.
    fused_decode_chunk_exec`): integer LM cell + CDF head + range decoder
    in one scan per chunk, carries chained device-to-device. No tier /
    checksum protocol — integer arithmetic reproduces the encoder's CDF
    rows exactly on any platform or executable; end-to-end integrity is
    the container's "cc" CRC (checked by the caller). Returns codes
    `[S, K, max(Ts)]` (ragged tails zero)."""
    from . import device_ac

    S = len(datas)
    T_max = max(Ts)
    chunk = ilm.CODEC_CHUNK
    exec_ = ilm.fused_decode_chunk_exec()

    max_len = max(len(d) for d in datas)
    bucket = max_len + (-max_len % 8192 or 8192)
    buf = jnp.asarray(np.stack([
        np.frombuffer(d + b"\x00" * (bucket - len(d)), np.uint8)
        for d in datas]))
    nbits = jnp.asarray([8 * len(d) for d in datas], jnp.int32)
    ts = jnp.asarray(Ts, jnp.int32)

    state = ilm.init_stream(batch=S)
    ac = device_ac.init_state(batch=S)
    prev = jnp.zeros((S, K), jnp.int32)
    outs = []
    for c in range(-(-T_max // chunk)):
        t0 = jnp.asarray(c * chunk, jnp.int32)
        syms, ok, eof, state, ac, prev = exec_(
            ilm.iparams, state, ac, buf, nbits, prev, ts, t0)
        outs.append((syms, ok, eof))   # device arrays — no sync yet
    cat = (list(outs[0]) if len(outs) == 1 else
           [jnp.concatenate([o[i] for o in outs]) for i in range(3)])
    syms_all = np.asarray(cat[0])[:T_max]             # [T, S, K]
    codes = np.moveaxis(syms_all, 0, -1).astype(np.int64)
    okf = np.asarray(cat[1])[:T_max]
    eof = np.asarray(cat[2])[:T_max]
    if eof.any():
        raise EOFError("The stream ended sooner than expected.")
    if not okf.all():
        raise RuntimeError("Binary search failed")
    return codes


def _decompress_lm_restart(fo, model, lockstep, K: int, audio_length: int,
                           frame_lengths, R: int, decode=None,
                           verify_codes=lambda fc: None):
    """Decode an "lmb"-blocked single-frame LM file: the frame's codes were
    entropy-coded in independent R-token blocks (fresh LM state each), so
    all blocks decode in LOCKSTEP — block-count x fewer device round-trips
    than one sequential pass over the frame."""
    frame_length = int(math.ceil(
        audio_length * model.frame_rate / model.sample_rate))
    if model.normalize:
        scale_f, = struct.unpack(
            "!f", binary._read_exactly(fo, struct.calcsize("!f")))
        scale = jnp.full((1, 1), scale_f, jnp.float32)
    else:
        scale = None
    Ts = [min(R, frame_length - i) for i in range(0, frame_length, R)]
    assert len(Ts) == len(frame_lengths), (Ts, frame_lengths)
    datas = [binary._read_exactly(fo, nbytes) for nbytes in frame_lengths]
    blocks = lockstep(datas, K, Ts)
    codes = np.concatenate([blocks[s, :, :Ts[s]] for s in range(len(Ts))],
                           axis=1)
    verify_codes([codes])
    frames = [(jnp.asarray(codes.astype(np.int32))[None], scale)]
    wav = (decode or model.decode)(frames)
    return wav[0, :, :audio_length], model.sample_rate


def compress(model, wav, use_lm: bool = False, lm=None, models=None,
             lm_restart: tp.Union[int, str, None] = None,
             portable: bool = True, tie_guard: bool = True) -> bytes:
    """Compress a `[C, T]` waveform, returning the `.ecdc` bytes."""
    fo = io.BytesIO()
    compress_to_file(model, wav, fo, use_lm=use_lm, lm=lm, models=models,
                     lm_restart=lm_restart, portable=portable,
                     tie_guard=tie_guard)
    return fo.getvalue()


def decompress(compressed: bytes, device=None, models=None, lm=None,
               repository: tp.Optional[str] = None):
    """Decompress `.ecdc` bytes → `(wav [C, T], sample_rate)`."""
    return decompress_from_file(io.BytesIO(compressed), device=device,
                                models=models, lm=lm, repository=repository)
