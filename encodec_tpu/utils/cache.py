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

The full cpuinfo block proved insufficient in turn: hosts can expose
byte-identical /proc/cpuinfo (a boot-time kernel snapshot) while the
CPUID instruction — which LLVM's host detection executes directly —
resolves differently (live migration under a hypervisor). Two probes
close that gap:

- `_cpuid_tuning_probe`: gcc's -march=native view (gcc runs CPUID
  itself). Fast fallback; note gcc and LLVM use different decision
  trees (on one observed host gcc resolves cooperlake while LLVM
  detects the full sapphire-rapids feature set), so this is a proxy.
- `xla_cpu_machine_signature`: the authoritative probe. Compiles a
  tiny canary through XLA:CPU into a throwaway cache dir and hashes
  the target-machine feature string embedded in the serialized AOT
  result — the exact byte string XLA's own loader compares on reload.
  By construction, any detection change the loader could ever see
  changes this signature.

IMPORTANT diagnostic correction (verified 2026-08-18): XLA's loader
message "Target machine feature +prefer-no-scatter|gather is not
supported on the host machine" fires on EVERY reload, including a
same-process-generation reload on an unchanged host — `prefer-no-*`
are LLVM TUNING features present in the compile-time feature string
but never in the host's CPUID-derived feature list the loader checks
against. That message alone is NOT evidence of a stale cache; genuine
staleness shows as ISA features (amx/avx512*) differing, or as the
bitwise divergence the entropy-codec checksums catch.
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
    """CPUID-level view of the CPU, as gcc's host detection sees it.

    `gcc -march=native` executes CPUID directly, so its detected march +
    feature set captures identity that a stale /proc/cpuinfo snapshot
    misses (live migration). It is a PROXY for LLVM's view — gcc's
    decision tree differs (observed: gcc resolves cooperlake where LLVM
    detects sapphire-rapids features) — used only as a fallback when
    `xla_cpu_machine_signature` cannot run. Returns '' when gcc is
    unavailable (the fingerprint then falls back to cpuinfo only)."""
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


_xla_sig_cache: tp.Optional[str] = None  # '' = probed, unavailable


def _decompress_cache_entry(raw: bytes) -> bytes:
    """Persistent-cache entries are zstd- (preferred) or zlib-compressed
    depending on what jax found at import; fall through to raw bytes."""
    try:
        import zstandard
        return zstandard.ZstdDecompressor().decompress(
            raw, max_output_size=1 << 30)
    except Exception:
        pass
    try:
        import zlib
        return zlib.decompress(raw)
    except Exception:
        return raw


def xla_cpu_machine_signature() -> tp.Optional[str]:
    """Digest of the target-machine feature string XLA:CPU embeds in its
    serialized AOT results — LLVM's live host detection, captured by
    compiling a tiny canary into a throwaway cache dir and reading it
    back. This is exactly the byte string the AOT loader compares when
    reloading a cached executable, so it is the authoritative staleness
    key (CPUID-level; immune to /proc/cpuinfo being a stale boot-time
    snapshot, and to gcc-vs-LLVM decision-tree differences).

    Only runs when jax is importable AND the process has explicitly
    selected the cpu platform (never risks initializing an accelerator
    backend). Returns None when unavailable; cached per process
    (~0.3 s once)."""
    global _xla_sig_cache
    if _xla_sig_cache is not None:
        return _xla_sig_cache or None
    sig = ""
    try:
        import jax
        platforms = str(getattr(jax.config, "jax_platforms", None) or "")
        if "cpu" in platforms.split(","):
            import pathlib
            import re
            import tempfile

            import jax.numpy as jnp
            from jax._src import compilation_cache as _cc
            prev_dir = jax.config.jax_compilation_cache_dir
            prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
            with tempfile.TemporaryDirectory() as tmp:
                try:
                    jax.config.update("jax_compilation_cache_dir", tmp)
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 0.0)
                    _cc.reset_cache()
                    jax.jit(lambda x: x @ x)(
                        jnp.ones((8, 8), jnp.float32)).block_until_ready()
                    feats: set[bytes] = set()
                    for f in pathlib.Path(tmp).iterdir():
                        data = _decompress_cache_entry(f.read_bytes())
                        feats.update(re.findall(
                            rb"\+64bit[\x20-\x7e]{16,8000}", data))
                    if feats:
                        sig = hashlib.sha256(
                            b"\n".join(sorted(feats))).hexdigest()[:16]
                finally:
                    jax.config.update("jax_compilation_cache_dir", prev_dir)
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", prev_min)
                    try:
                        _cc.reset_cache()
                    except Exception:
                        pass
    except Exception:
        sig = ""
    _xla_sig_cache = sig
    return sig or None


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
    OS error.

    The marker combines the cpuinfo/gcc fingerprint with the
    authoritative `xla_cpu_machine_signature` when the latter can run
    (cpu platform selected), so a live-migrated host whose cpuinfo text
    is unchanged still invalidates the cache the moment LLVM's detection
    shifts."""
    fp = host_cpu_fingerprint()
    if fp is None:
        return
    sig = xla_cpu_machine_signature()
    if sig:
        fp = f"{fp}:{sig}"
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
