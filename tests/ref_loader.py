"""Import helpers for the upstream reference implementation.

The reference at /root/reference is used strictly as a *behavioral oracle*
in parity tests: we instantiate its torch modules with random weights,
convert those weights into our parameter pytrees, and assert our outputs
match. Nothing from the reference ships in the package.

The reference needs two accommodations to import outside its repo:
- `encodec/utils.py` imports torchaudio (not installed) → stub it.
- several modules use absolute imports resolved via sys.path hacks
  (`import quantization`, `import distrib`) → add the package dir to path.
"""

import os
import sys
import types

REFERENCE_ROOT = os.environ.get("ENCODEC_REFERENCE_ROOT", "/root/reference")
_PKG_DIR = os.path.join(REFERENCE_ROOT, "encodec")


def _ensure_paths():
    for p in (REFERENCE_ROOT, _PKG_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "torchaudio" not in sys.modules:
        import torch

        class _Spectrogram(torch.nn.Module):
            """Minimal torchaudio.transforms.Spectrogram for the oracle
            (center=False, power=None, normalized='window' semantics)."""

            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         window_fn=torch.hann_window, normalized=False,
                         center=True, pad_mode="reflect", power=2.0):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.register_buffer("window", window_fn(self.win_length))
                self.normalized = normalized
                self.center = center
                self.power = power

            def forward(self, x):
                shape = x.shape
                flat = x.reshape(-1, shape[-1])
                spec = torch.stft(flat, self.n_fft, self.hop_length,
                                  self.win_length, self.window,
                                  center=self.center, return_complex=True)
                spec = spec.reshape(shape[:-1] + spec.shape[-2:])
                if self.normalized:
                    spec = spec / self.window.pow(2.0).sum().sqrt()
                if self.power is None:
                    return spec
                return spec.abs() ** self.power

        stub = types.ModuleType("torchaudio")
        stub.transforms = types.ModuleType("torchaudio.transforms")
        stub.transforms.Spectrogram = _Spectrogram
        sys.modules["torchaudio"] = stub
        sys.modules["torchaudio.transforms"] = stub.transforms


def available() -> bool:
    return os.path.isdir(_PKG_DIR)


def load(module_name: str):
    """Import a reference module, e.g. load('encodec.modules.conv').

    Skips the calling test module when the reference checkout is absent
    (e.g. CI without the oracle) instead of erroring at collection.
    """
    if not available():
        import pytest
        pytest.skip(f"reference checkout not found at {REFERENCE_ROOT} "
                    "(set ENCODEC_REFERENCE_ROOT)", allow_module_level=True)
    _ensure_paths()
    import importlib
    return importlib.import_module(module_name)
