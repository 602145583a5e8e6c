"""Persistent-compilation-cache hygiene.

This container's virtual CPU advertises DIFFERENT feature sets across
sessions (observed drift: amx-complex / avx10 / prefer-no-gather|scatter),
and XLA:CPU loads feature-mismatched cached AOT executables with only a
warning — mixing a stale cached executable with a freshly compiled one
produced bitwise-divergent LM probabilities between two executables that
must agree (caught by the entropy codec's checksum self-check, which then
demoted decode to its fallback tier). The guard wipes the cache whenever
the host's CPU identity changes, making cache reuse safe again.

Fingerprinting the `flags` line alone proved insufficient (observed
2026-08-18): LLVM derives TUNING features — `prefer-no-gather` /
`prefer-no-scatter` — from the CPUID model identity, not from the
feature flags, so two fleet hosts with byte-identical `flags` lines
produced AOT executables XLA itself reports as machine-type-mismatched
("Target machine feature +prefer-no-scatter is not supported on the
host"). The fingerprint therefore covers the full CPU identity block:
vendor, family, model, model name, stepping, AND flags (volatile fields
like `cpu MHz` / `bogomips` are excluded so the cache survives ordinary
restarts on the same host).

The full cpuinfo block proved insufficient in turn (see
`_cpuid_tuning_probe`): the fingerprint now also hashes the compiler's
CPUID-derived -march=native view, which catches hosts whose hypervisor
masks CPUID differently under identical /proc/cpuinfo text.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import typing as tp

# cpuinfo keys that determine LLVM's host feature set (identity + ISA);
# everything else in the block is volatile or irrelevant to codegen
_IDENTITY_KEYS = ("vendor_id", "cpu family", "model", "model name",
                  "stepping", "flags")

_probe_cache: tp.Optional[str] = None


def _cpuid_tuning_probe() -> str:
    """CPUID-level view of the CPU, as compiler host detection sees it.

    The cpuinfo identity block proved insufficient too (observed
    2026-08-18): a cache stamped with a MATCHING cpuinfo fingerprint
    still failed XLA's AOT machine-type check (`+prefer-no-gather is not
    supported on the host`) — two fleet hosts expose byte-identical
    /proc/cpuinfo yet different CPUID identity to userspace (hypervisor
    masking), and LLVM's host detection executes CPUID directly.
    `gcc -march=native` also runs CPUID itself, so its detected march +
    feature set captures exactly the identity /proc/cpuinfo misses
    (here: cpuinfo advertises amx/avx512fp16 while CPUID resolves to
    cooperlake without them). Returns '' when gcc is unavailable (the
    fingerprint then falls back to cpuinfo only)."""
    global _probe_cache
    if _probe_cache is None:
        import subprocess
        try:
            out = subprocess.run(
                ["gcc", "-march=native", "-Q", "--help=target"],
                capture_output=True, text=True, timeout=30).stdout
            _probe_cache = "\n".join(
                ln.strip() for ln in out.splitlines()
                if "-march=" in ln or "[enabled]" in ln
                or "[disabled]" in ln)
        except Exception:
            _probe_cache = ""
    return _probe_cache


def host_cpu_fingerprint(cpuinfo_path: str = "/proc/cpuinfo") -> str | None:
    """Digest of the first cpuinfo processor block's identity keys plus
    the CPUID-level compiler probe, or None if cpuinfo is unreadable."""
    try:
        with open(cpuinfo_path) as fh:
            block = fh.read().split("\n\n", 1)[0]
    except OSError:
        return None
    ident = [line for line in block.splitlines()
             if line.split(":")[0].strip() in _IDENTITY_KEYS]
    ident.append(_cpuid_tuning_probe())
    return hashlib.sha256("\n".join(ident).encode()).hexdigest()[:16]


def guard_cache_host_fingerprint(cache_dir: str) -> None:
    """Wipe `cache_dir` if it was populated under a different host CPU
    identity; stamp the current fingerprint. A non-empty cache with NO
    marker is also wiped — it predates the guard (or lost its marker), so
    its host identity is unknown and it must not be legitimized by
    stamping the current fingerprint over it. No-op (best effort) on any
    OS error."""
    fp = host_cpu_fingerprint()
    if fp is None:
        return
    marker = os.path.join(cache_dir, "HOST_FINGERPRINT")
    try:
        if os.path.exists(marker):
            stale = open(marker).read() != fp
        else:
            stale = os.path.isdir(cache_dir) and bool(os.listdir(cache_dir))
        if stale:
            shutil.rmtree(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(fp)
    except OSError:
        pass
