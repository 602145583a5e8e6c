"""Persistent-compilation-cache hygiene.

This container's virtual CPU advertises DIFFERENT feature sets across
sessions (observed drift: amx-complex / avx10 / prefer-no-gather|scatter),
and XLA:CPU loads feature-mismatched cached AOT executables with only a
warning — mixing a stale cached executable with a freshly compiled one
produced bitwise-divergent LM probabilities between two executables that
must agree (caught by the entropy codec's checksum self-check, which then
demoted decode to its fallback tier). The guard wipes the cache whenever
the host's CPU flags change, making cache reuse safe again.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def guard_cache_host_fingerprint(cache_dir: str) -> None:
    """Wipe `cache_dir` if it was populated under different host CPU flags;
    stamp the current fingerprint. No-op (best effort) on any OS error."""
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next((line for line in fh if line.startswith("flags")),
                         "")
        fp = hashlib.sha256(flags.encode()).hexdigest()[:16]
    except OSError:
        return
    marker = os.path.join(cache_dir, "HOST_FINGERPRINT")
    try:
        if os.path.exists(marker) and open(marker).read() != fp:
            shutil.rmtree(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(fp)
    except OSError:
        pass
