"""`encodec`-compatible command line (ref encodec/__main__.py).

Usage:
    python -m encodec_tpu INPUT.wav [OUTPUT.ecdc|OUTPUT.wav] [-b BW] [--hq]
    python -m encodec_tpu INPUT.ecdc [OUTPUT.wav]

.wav input → compression (or a full roundtrip when the output is also .wav);
.ecdc input → decompression. `--repository DIR` points at a local directory
holding the published pretrained checkpoints (torch .th files) for offline
use; otherwise they are fetched via torch.hub.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

SUFFIX = ".ecdc"


def get_parser():
    parser = argparse.ArgumentParser(
        "encodec_tpu",
        description="High fidelity neural audio codec (TPU-native). "
                    "If input is a .ecdc, decompresses it. "
                    "If input is .wav, compresses it. If output is also wav, "
                    "do a compression/decompression cycle.")
    parser.add_argument("input", type=Path,
                        help="Input file (wav or ecdc).")
    parser.add_argument("output", type=Path, nargs="?",
                        help="Output file, otherwise inferred from input.")
    parser.add_argument("-b", "--bandwidth", type=float, default=6,
                        choices=[1.5, 3., 6., 12., 24.],
                        help="Target bandwidth (1.5, 3, 6, 12 or 24 kbps). "
                             "1.5 is not supported with --hq.")
    parser.add_argument("-q", "--hq", action="store_true",
                        help="Use the 48 kHz stereo HQ model.")
    parser.add_argument("-l", "--lm", action="store_true",
                        help="Entropy-code with the language model "
                             "(smaller files, slower).")
    parser.add_argument("-f", "--force", action="store_true",
                        help="Overwrite output file if it exists.")
    parser.add_argument("-s", "--decompress_suffix", type=str,
                        default="_decompressed",
                        help="Suffix for the decompressed output file.")
    parser.add_argument("-r", "--rescale", action="store_true",
                        help="Rescale the output to avoid clipping.")
    parser.add_argument("--lm-pinned", action="store_true",
                        help="write the legacy lmv=2 LM stream (pinned to "
                             "this platform's compiled float-LM executable) "
                             "instead of the portable integer-LM lmv=3.")
    parser.add_argument("--lm-restart", type=_lm_restart_arg,
                        default="auto", metavar="N",
                        help="with --lm: reset the LM every N tokens and "
                             "entropy-code blocks independently — slightly "
                             "larger files, block-parallel decoding. "
                             "Default 'auto' picks the measured knee on "
                             "single-frame streams (5 s of tokens, <0.4%% "
                             "rate cost for lockstep-parallel decode; "
                             "probes/lm_restart_rate.py); 0 disables "
                             "blocking")
    parser.add_argument("--repository", type=Path, default=None,
                        help="Local directory with the pretrained .th "
                             "checkpoints (offline mode).")
    return parser


def _lm_restart_arg(s: str):
    """'auto' (default) | 0/none (disable) | positive int block length."""
    if s.lower() == "auto":
        return "auto"
    if s.lower() in ("0", "none", "off"):
        return None
    n = int(s)
    if n <= 0:
        raise ValueError(s)
    return n


def fatal(*args):
    print(*args, file=sys.stderr)
    sys.exit(1)


def check_output_exists(args):
    if not args.output.parent.exists():
        fatal(f"Output folder for {args.output} does not exist.")
    if args.output.exists() and not args.force:
        fatal(f"Output file {args.output} exist. Use -f / --force to overwrite.")


def check_clipping(wav, args):
    import numpy as np
    if args.rescale:
        return
    mx = float(np.abs(np.asarray(wav)).max())
    if mx > 0.99:
        print(f"Clipping!! max scale {mx}, limit is 0.99. "
              "To avoid clipping, use the `-r` option to rescale the output.",
              file=sys.stderr)


def main():
    from .utils import honor_platform_env
    honor_platform_env()
    args = get_parser().parse_args()
    if not args.input.exists():
        fatal(f"Input file {args.input} does not exist.")

    # import lazily so `--help` stays instant
    from .models.model import MODELS
    from .stream import compress, decompress
    from .utils.audio import load_wav, save_wav, convert_audio

    rep = str(args.repository) if args.repository else None

    def make_models():
        return {name: (lambda pretrained=True, fn=fn: fn(
            pretrained=pretrained, repository=rep))
            for name, fn in MODELS.items()}

    if args.input.suffix.lower() == SUFFIX:
        # Decompression
        if args.output is None:
            # Deliberate deviation from the reference: its decompression
            # path (__main__.py:88) uses .with_suffix('.wav'), which
            # mangles dotted stems ("night.v2.ecdc" → "night.wav"); we
            # concatenate instead ("night.v2_decompressed.wav").
            args.output = args.input.with_name(
                args.input.stem + args.decompress_suffix + ".wav")
        elif args.output.suffix.lower() != ".wav":
            fatal("Output extension must be .wav")
        check_output_exists(args)
        out, out_sample_rate = decompress(args.input.read_bytes(),
                                          models=make_models(),
                                          repository=rep)
        import numpy as np
        out = np.asarray(out)
        check_clipping(out, args)
        save_wav(out, args.output, out_sample_rate, rescale=args.rescale)
    else:
        # Compression
        if args.output is None:
            args.output = args.input.with_suffix(SUFFIX)
        elif args.output.suffix.lower() not in [SUFFIX, ".wav"]:
            fatal(f"Output extension must be .wav or {SUFFIX}")
        check_output_exists(args)

        model_name = "encodec_48khz" if args.hq else "encodec_24khz"
        # validate before touching checkpoints so errors are instant
        known_bandwidths = {
            "encodec_24khz": [1.5, 3.0, 6.0, 12.0, 24.0],
            "encodec_48khz": [3.0, 6.0, 12.0, 24.0],
        }
        if args.bandwidth not in known_bandwidths[model_name]:
            fatal(f"Bandwidth {args.bandwidth} is not supported by the model "
                  f"{model_name}")
        model = make_models()[model_name]()
        model.set_target_bandwidth(args.bandwidth)

        wav, sr = load_wav(args.input)
        wav = convert_audio(wav, sr, model.sample_rate, model.channels)
        lm = None
        if args.lm:
            from .models.lm import get_lm_model
            lm = get_lm_model(model, repository=rep)
        compressed = compress(model, wav, use_lm=args.lm, lm=lm,
                              lm_restart=args.lm_restart,
                              portable=not args.lm_pinned)
        if args.output.suffix.lower() == SUFFIX:
            args.output.write_bytes(compressed)
        else:
            assert args.output.suffix.lower() == ".wav"
            out, out_sample_rate = decompress(compressed, models=make_models(),
                                              lm=lm)
            import numpy as np
            out = np.asarray(out)
            check_clipping(out, args)
            save_wav(out, args.output, out_sample_rate, rescale=args.rescale)


if __name__ == "__main__":
    main()
