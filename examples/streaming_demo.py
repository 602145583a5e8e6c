"""Example: chunked streaming encode/decode with carry state.

Feeds 250 ms chunks through the causal 24 kHz codec and verifies the
streamed codes/audio match the offline batch path exactly.

    python examples/streaming_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encodec_tpu.utils import honor_platform_env
honor_platform_env()



def main():
    import jax
    from encodec_tpu.models import build_model, StreamingCodec

    model = build_model([1.5, 3.0, 6.0, 12.0, 24.0], sample_rate=24_000,
                        channels=1, causal=True, model_norm="weight_norm",
                        name="encodec_24khz", ratios=[8, 5, 4, 2], bins=1024,
                        dimension=128, kmeans_init=False)
    model.set_target_bandwidth(6.0)

    hop = model.cfg.seanet.hop_length          # 320 samples
    chunk_samples = hop * 20                   # ~267 ms
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, chunk_samples * 6))

    # offline
    frames = model.encode(x)
    offline_codes = np.asarray(frames[0][0])

    # streaming
    codec = StreamingCodec(model)
    streamed_codes, streamed_audio = [], []
    for i in range(6):
        chunk = x[:, :, i * chunk_samples:(i + 1) * chunk_samples]
        codes = codec.encode_chunk(chunk)
        streamed_codes.append(np.asarray(codes))
        streamed_audio.append(np.asarray(codec.decode_chunk(codes)))
    streamed_codes = np.concatenate(streamed_codes, axis=-1)

    assert (streamed_codes == offline_codes).all(), "codes diverged!"
    print(f"6 chunks x {chunk_samples} samples streamed")
    print(f"codes: {streamed_codes.shape}, exact match with offline: True")
    print(f"decoded audio: {np.concatenate(streamed_audio, axis=-1).shape}")


if __name__ == "__main__":
    main()
