"""Batch (directory) compression with shared compiled executables.

The single-file path (`stream.compress.compress_to_file`) jit-compiles one
encode graph per distinct input length — fine for one file, ruinous for a
dataset sweep where every file differs (a fresh XLA compile per file; on a
remote-compiled TPU, minutes each). For causal non-segmented models this
tool routes code extraction through `tools.inference._StreamExtractor`
instead: a fixed-chunk streaming encoder plus a binary remainder ladder —
≤ 2 + log2(chunk_hops) executables TOTAL for any mix of file lengths at
least one chunk long (files SHORTER than chunk_hops·hop still compile
per distinct length; a warning suggests shrinking --chunk-hops) —
bit-exact with the offline encoder for every length (tested), so the
written `.ecdc` bytes are identical to per-file compression.

Segmented/normalized models (48 kHz) fall back to the plain per-file path:
their per-segment volume scaling depends on whole-segment content, which
zero-padded streaming cannot reproduce; their fused encode executable is
keyed by total length. The reference has no batch tool at all (one process
per file, `encodec` CLI).

    python -m encodec_tpu.tools.batch IN_DIR OUT_DIR [-b BW] [--lm] ...
"""

from __future__ import annotations

import argparse
import os
import typing as tp


def compress_directory(model, in_dir: str, out_dir: str, *,
                       use_lm: bool = False, lm=None, models=None,
                       lm_restart: tp.Union[int, str, None] = None,
                       chunk_hops: int = 1024,
                       progress: bool = False,
                       portable: bool = True) -> tp.List[str]:
    """Compress every `.wav` under `in_dir` (non-recursive) to
    `out_dir/<stem>.ecdc`. Returns the written paths.

    Output bytes are identical to running `compress_to_file` per file;
    only the compilation count changes (shared streaming executables on
    causal non-segmented models).
    """
    import numpy as np
    import jax.numpy as jnp

    from ..stream.compress import compress_to_file
    from ..utils.audio import load_wav, convert_audio

    extractor = None
    if model.cfg.seanet.causal and not model.normalize \
            and model.segment_length is None:
        from .inference import _StreamExtractor
        extractor = _StreamExtractor(model, chunk_hops=chunk_hops)

    os.makedirs(out_dir, exist_ok=True)
    written: tp.List[str] = []
    warned_short = False
    names = sorted(n for n in os.listdir(in_dir) if n.endswith(".wav"))
    for i, name in enumerate(names):
        wav, sr = load_wav(os.path.join(in_dir, name))
        wav = convert_audio(wav, sr, model.sample_rate, model.channels)
        if (extractor is not None and not warned_short
                and wav.shape[-1] < extractor.chunk):
            import warnings
            warnings.warn(
                f"{name} ({wav.shape[-1]} samples) is shorter than the "
                f"shared-executable chunk ({extractor.chunk}); sub-chunk "
                "files fall back to one fresh XLA compile per distinct "
                "length — pass a smaller --chunk-hops to share "
                "executables across short files", stacklevel=2)
            warned_short = True
        frames = None
        if extractor is not None:
            codes = extractor(np.asarray(wav))                 # [K, T']
            frames = [(jnp.asarray(codes.astype(np.int32))[None], None)]
        out_path = os.path.join(out_dir, os.path.splitext(name)[0] + ".ecdc")
        with open(out_path, "wb") as fo:
            compress_to_file(model, np.asarray(wav), fo, use_lm=use_lm,
                             lm=lm, models=models, lm_restart=lm_restart,
                             frames=frames, portable=portable)
        written.append(out_path)
        if progress:
            print(f"[{i + 1}/{len(names)}] {name} -> "
                  f"{os.path.getsize(out_path)} bytes", flush=True)
    return written


def _make_bucketed_decode(model, pcm16: bool = False):
    """`decode(frames)` that pads single-frame causal codes to the next
    power-of-two length and trims the audio — one executable per BUCKET
    instead of per distinct frame count. Causality guarantees the padded
    tail codes never reach the kept samples; what remains is XLA's
    length-dependent codegen, worth ~1 ulp at isolated positions
    (measured: 2/3201 samples off by one int16 LSB) — within decode's
    float-tolerance contract (BASELINE.md), same class as the streaming
    decoder's chunk-boundary ulps."""
    import jax.numpy as jnp

    hop = model.cfg.seanet.hop_length

    def decode(frames):
        if len(frames) != 1 or frames[0][1] is not None:
            return model.decode(frames, pcm16=pcm16)  # segmented: plain
        codes, _ = frames[0]
        T = int(codes.shape[-1])
        Tb = max(8, 1 << (T - 1).bit_length())
        if Tb != T:
            codes = jnp.pad(codes, ((0, 0), (0, 0), (0, Tb - T)))
        wav = model.decode([(codes, None)], pcm16=pcm16)
        return wav[:, :, :T * hop]

    return decode


def decompress_directory(in_dir: str, out_dir: str, *, models=None, lm=None,
                         repository: tp.Optional[str] = None,
                         pcm16: bool = False,
                         progress: bool = False,
                         lockstep: int = 16) -> tp.List[str]:
    """Decompress every `.ecdc` under `in_dir` to `out_dir/<stem>.wav`.

    Causal models decode through bucketed shared executables
    (`_make_bucketed_decode`): ≤ log2(longest) decode compiles for any mix
    of file lengths, audio within ~1 int16 LSB of per-file decode at
    isolated positions (decode's float-tolerance contract — see
    `_make_bucketed_decode`). Non-causal/segmented models use the plain
    per-file path. The model (and, for LM-coded files, the LM with all
    its decode executables) is built ONCE per model name and reused for
    every file. `pcm16=True` quantizes to int16 ON DEVICE (bit-identical
    to save_wav's host quantizer) so audio crosses the host<->device link
    at half the bytes. Returns the written paths.

    Portable LM files (lmv=3, single-frame causal layout) additionally
    decode their entropy streams in LOCKSTEP across files — up to
    `lockstep` files share one S-lane fused LM+range-decoder scan, so the
    per-scan-iteration floor amortizes (measured 3.2x token throughput at
    S=16, probes/ilm_lockstep.py / BENCH.md). Codes, CRC checks, and the
    written wavs are identical to per-file decoding (`lockstep=1`
    restores it): the S-lane executable computes the same exact integer
    arithmetic per lane, and the audio decode stays per-file.
    """
    import numpy as np

    from ..models.model import MODELS
    from ..stream import binary
    from ..stream.compress import decompress_from_file
    from ..utils.audio import save_wav

    os.makedirs(out_dir, exist_ok=True)
    # per-model-name caches: the built model is re-served to
    # decompress_from_file through a registry override (so its jit caches
    # are shared across files), the bucketed decode closure alongside it,
    # and the LM — whose chunk/CDF executables are per-instance — lazily
    # on the first LM-coded file
    shared_registry = dict(models if models is not None else MODELS)
    decoders: tp.Dict[str, tp.Any] = {}
    lms: tp.Dict[str, tp.Any] = {}
    names = sorted(n for n in os.listdir(in_dir) if n.endswith(".ecdc"))

    def get_model(model_name):
        if model_name not in decoders:
            model = shared_registry[model_name](pretrained=True)
            shared_registry[model_name] = \
                lambda pretrained=True, _m=model: _m
            decoders[model_name] = (
                _make_bucketed_decode(model, pcm16=pcm16)
                if model.cfg.seanet.causal and not model.normalize
                and model.segment_length is None
                else ((lambda f, _m=model: _m.decode(f, pcm16=True))
                      if pcm16 else None))
        return shared_registry[model_name]()

    def get_lm(model_name):
        if lm is not None:
            return lm
        if model_name not in lms:
            from ..models.lm import get_lm_model
            lms[model_name] = get_lm_model(shared_registry[model_name](),
                                           repository=repository)
        return lms[model_name]

    # pass 1: headers only — route each file to the lockstep LM path or
    # the per-file path
    metas = []
    groups: tp.Dict[tp.Tuple[str, int], tp.List[int]] = {}
    for i, name in enumerate(names):
        with open(os.path.join(in_dir, name), "rb") as fo:
            meta = binary.read_ecdc_header(fo)
            offset = fo.tell()
        metas.append((meta, offset))
        model = get_model(meta["m"])
        if (lockstep > 1 and meta.get("lm") and meta.get("lmv") == 3
                and "fl" not in meta and "lmb" not in meta
                and model.cfg.seanet.causal and not model.normalize
                and model.segment_length is None):
            groups.setdefault((meta["m"], int(meta["nc"])), []).append(i)

    grouped = {i for g in groups.values() for i in g}
    written: tp.Dict[int, str] = {}
    done = 0

    def emit(i, wav, sr):
        nonlocal done
        out_path = os.path.join(
            out_dir, os.path.splitext(names[i])[0] + ".wav")
        save_wav(np.asarray(wav), out_path, sr)
        written[i] = out_path
        done += 1
        if progress:
            print(f"[{done}/{len(names)}] {names[i]} -> {out_path}",
                  flush=True)

    # lockstep LM groups: S files advance one S-lane fused decoder
    for (model_name, n_q), idxs in groups.items():
        import jax.numpy as jnp
        import math
        from ..models.ilm import IntLMModel, codes_checksum
        from ..stream.compress import _lockstep_decode_int
        model = get_model(model_name)
        ilm = IntLMModel.from_lm(get_lm(model_name))
        decode = decoders[model_name]
        for s0 in range(0, len(idxs), max(1, lockstep)):
            lane = idxs[s0:s0 + max(1, lockstep)]
            datas, lengths = [], []
            for i in lane:
                meta, offset = metas[i]
                with open(os.path.join(in_dir, names[i]), "rb") as fo:
                    fo.seek(offset)
                    datas.append(fo.read())
                lengths.append(int(math.ceil(
                    meta["al"] * model.frame_rate / model.sample_rate)))
            all_codes = _lockstep_decode_int(datas, ilm, n_q, lengths)
            for s, i in enumerate(lane):
                meta, _ = metas[i]
                codes = all_codes[s, :, :lengths[s]]
                expected_cc = meta.get("cc")
                if expected_cc is not None:
                    got = codes_checksum([codes])
                    if got != expected_cc:
                        raise ValueError(
                            f"{names[i]}: lmv=3 code checksum mismatch "
                            f"(got {got:#x}, header says {expected_cc:#x})"
                            " — corrupt stream or decoder bug; refusing "
                            "to emit audio.")
                frames = [(jnp.asarray(codes.astype(np.int32))[None], None)]
                wav = decode(frames)
                emit(i, wav[0, :, :meta["al"]], model.sample_rate)

    # everything else: the per-file path
    for i, name in enumerate(names):
        if i in grouped:
            continue
        meta, _ = metas[i]
        get_model(meta["m"])
        file_lm = get_lm(meta["m"]) if meta["lm"] else lm
        with open(os.path.join(in_dir, name), "rb") as fo:
            wav, sr = decompress_from_file(
                fo, models=shared_registry, lm=file_lm,
                repository=repository, decode=decoders[meta["m"]])
        emit(i, wav, sr)
    return [written[i] for i in range(len(names))]


def main() -> None:
    from ..utils import honor_platform_env
    honor_platform_env()
    parser = argparse.ArgumentParser(
        description="Compress (or --decompress) a directory with shared "
                    "compiled executables")
    parser.add_argument("in_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--decompress", action="store_true",
                        help="decode .ecdc files to wavs instead")
    parser.add_argument("--pcm16", action="store_true",
                        help="quantize decoded audio to int16 on device "
                             "(halves device->host transfer; quantizer is "
                             "bit-identical to the host wav writer)")
    parser.add_argument("-b", "--bandwidth", type=float, default=6.0)
    parser.add_argument("--hq", action="store_true",
                        help="48 kHz stereo model (per-file path)")
    parser.add_argument("--lm", action="store_true")
    parser.add_argument("--lm-restart", type=int, default=None)
    parser.add_argument("--repository", default=None,
                        help="local pretrained checkpoint directory")
    parser.add_argument("--chunk-hops", type=int, default=1024)
    args = parser.parse_args()

    if args.decompress:
        paths = decompress_directory(args.in_dir, args.out_dir,
                                     repository=args.repository,
                                     pcm16=args.pcm16, progress=True)
        print(f"wrote {len(paths)} files to {args.out_dir}")
        return

    from ..models.model import encodec_model_24khz, encodec_model_48khz
    factory = encodec_model_48khz if args.hq else encodec_model_24khz
    model = factory(pretrained=True, repository=args.repository)
    model.set_target_bandwidth(args.bandwidth)
    lm = None
    if args.lm:
        from ..models.lm import get_lm_model
        lm = get_lm_model(model, repository=args.repository)
    paths = compress_directory(model, args.in_dir, args.out_dir,
                               use_lm=args.lm, lm=lm,
                               lm_restart=args.lm_restart,
                               chunk_hops=args.chunk_hops, progress=True)
    print(f"wrote {len(paths)} files to {args.out_dir}")


if __name__ == "__main__":
    main()
