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

REFERENCE_ROOT = "/root/reference"
_PKG_DIR = os.path.join(REFERENCE_ROOT, "encodec")


def _ensure_paths():
    for p in (REFERENCE_ROOT, _PKG_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "torchaudio" not in sys.modules:
        stub = types.ModuleType("torchaudio")
        stub.transforms = types.ModuleType("torchaudio.transforms")
        sys.modules["torchaudio"] = stub
        sys.modules["torchaudio.transforms"] = stub.transforms


def available() -> bool:
    return os.path.isdir(_PKG_DIR)


def load(module_name: str):
    """Import a reference module, e.g. load('encodec.modules.conv')."""
    _ensure_paths()
    import importlib
    return importlib.import_module(module_name)
