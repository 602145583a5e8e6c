"""Example: compress → decompress roundtrip with the 24 kHz codec.

Offline use (no network): pass a directory containing the published
pretrained checkpoints via --repository; without pretrained weights this
example still runs with random weights to demonstrate the pipeline.

    python examples/roundtrip.py input.wav [--repository DIR] [--bandwidth 6]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodec_tpu.utils import honor_platform_env
honor_platform_env()



def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", nargs="?",
                        default="/root/reference/test_24k.wav")
    parser.add_argument("--repository", default=None)
    parser.add_argument("--bandwidth", type=float, default=6.0)
    args = parser.parse_args()

    from encodec_tpu.models import encodec_model_24khz
    from encodec_tpu.stream import compress, decompress
    from encodec_tpu.utils.audio import load_wav, convert_audio

    model = encodec_model_24khz(pretrained=args.repository is not None,
                                repository=args.repository)
    # register under the model's own name so .ecdc metadata roundtrips
    # (random-weight models are named 'unset' per reference semantics)
    registry = {model.name: lambda pretrained=True, m=model: m}
    model.set_target_bandwidth(args.bandwidth)

    wav, sr = load_wav(args.input)
    wav = convert_audio(wav, sr, model.sample_rate, model.channels)
    wav = wav[:, :model.sample_rate * 2]  # 2 seconds

    data = compress(model, wav, models=registry)
    out, out_sr = decompress(data, models=registry)
    out = np.asarray(out)

    dur = wav.shape[-1] / model.sample_rate
    print(f"input:  {wav.shape} @ {model.sample_rate} Hz ({dur:.1f}s)")
    print(f"ecdc:   {len(data)} bytes = {8 * len(data) / 1000 / dur:.2f} kbps "
          f"(target {args.bandwidth})")
    print(f"output: {out.shape} @ {out_sr} Hz")
    print(f"rms in/out: {np.sqrt((wav ** 2).mean()):.4f} / "
          f"{np.sqrt((out ** 2).mean()):.4f}")


if __name__ == "__main__":
    main()
