"""Persistent-compilation-cache host-fingerprint guard (utils/cache.py).

Regression for the 2026-08-18 flakes: stale cross-host XLA:CPU AOT
executables divergent from fresh compiles survived a flags-only
fingerprint (and /proc/cpuinfo is a boot-time snapshot, so even the full
identity block can miss a live migration that shifts LLVM's CPUID-level
host detection). The fingerprint must cover the CPU identity block, the
live detection probes (gcc -march=native fallback and the authoritative
XLA canary signature), and must NOT churn on volatile per-boot fields.
See utils/cache.py's module docstring for the corrected diagnosis of the
loader's always-on `+prefer-no-*` message.
"""

import os

from encodec_tpu.utils.cache import (guard_cache_host_fingerprint,
                                     host_cpu_fingerprint)

_BLOCK = """\
processor\t: 0
vendor_id\t: GenuineIntel
cpu family\t: 6
model\t\t: 207
model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz
stepping\t: 2
microcode\t: 0xffffffff
cpu MHz\t\t: 2100.000
cache size\t: 16384 KB
flags\t\t: fpu vme de pse tsc avx avx2 avx512f
bogomips\t: 4200.00
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text + "\n\nprocessor\t: 1\nmodel\t\t: 999\n")
    return str(p)


def test_fingerprint_covers_model_identity_not_just_flags(tmp_path):
    """Same flags line + different CPU model must change the fingerprint
    (the exact drift the flags-only digest missed)."""
    base = _write(tmp_path, "a", _BLOCK)
    other_model = _write(tmp_path, "b",
                         _BLOCK.replace("model\t\t: 207", "model\t\t: 143")
                               .replace("@ 2.10GHz", "@ 2.80GHz"))
    assert host_cpu_fingerprint(base) != host_cpu_fingerprint(other_model)


def test_fingerprint_ignores_volatile_fields(tmp_path):
    """cpu MHz / bogomips / microcode drift across boots of the SAME host
    must not wipe the cache."""
    base = _write(tmp_path, "a", _BLOCK)
    volatile = _write(tmp_path, "b",
                      _BLOCK.replace("2100.000", "1999.613")
                            .replace("4200.00", "4199.98")
                            .replace("0xffffffff", "0x1"))
    assert host_cpu_fingerprint(base) == host_cpu_fingerprint(volatile)


def test_fingerprint_only_first_block(tmp_path):
    """Secondary processor blocks (which repeat per core) are ignored."""
    p = tmp_path / "c"
    p.write_text(_BLOCK + "\n\nprocessor\t: 1\nmodel\t\t: 42\n")
    q = tmp_path / "d"
    q.write_text(_BLOCK + "\n\nprocessor\t: 1\nmodel\t\t: 77\n")
    assert host_cpu_fingerprint(str(p)) == host_cpu_fingerprint(str(q))


def test_fingerprint_unreadable_returns_none(tmp_path):
    assert host_cpu_fingerprint(str(tmp_path / "missing")) is None


def test_guard_wipes_on_identity_change(tmp_path, monkeypatch):
    import encodec_tpu.utils.cache as cache_mod
    cache_dir = tmp_path / "jc"
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: None)
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: "aaaa")
    guard_cache_host_fingerprint(str(cache_dir))
    (cache_dir / "entry").write_text("x")
    # same identity: cache survives
    guard_cache_host_fingerprint(str(cache_dir))
    assert (cache_dir / "entry").exists()
    # identity change: cache wiped, new marker stamped
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: "bbbb")
    guard_cache_host_fingerprint(str(cache_dir))
    assert not (cache_dir / "entry").exists()
    assert (cache_dir / "HOST_FINGERPRINT").read_text() == "bbbb"


def test_fingerprint_covers_cpuid_probe(tmp_path, monkeypatch):
    """Two hosts with byte-identical /proc/cpuinfo but different
    CPUID-derived compiler detection (hypervisor masking, observed
    2026-08-18 as an AOT machine-type rejection despite a matching
    cpuinfo fingerprint) must fingerprint differently."""
    import encodec_tpu.utils.cache as cache_mod
    p = tmp_path / "c"
    p.write_text(_BLOCK)
    monkeypatch.setattr(cache_mod, "_probe_cache", "-march=cooperlake")
    a = host_cpu_fingerprint(str(p))
    monkeypatch.setattr(cache_mod, "_probe_cache", "-march=sapphirerapids")
    b = host_cpu_fingerprint(str(p))
    assert a != b
    # same probe -> same fingerprint (stability)
    monkeypatch.setattr(cache_mod, "_probe_cache", "-march=cooperlake")
    assert host_cpu_fingerprint(str(p)) == a


def test_cpuid_probe_runs_or_degrades():
    """The live probe returns a string; on this container gcc exists and
    the output names a -march."""
    import encodec_tpu.utils.cache as cache_mod
    cache_mod._probe_cache = None
    probe = cache_mod._cpuid_tuning_probe()
    assert isinstance(probe, str)
    if probe:                      # gcc present here
        assert "-march=" in probe


def test_guard_marker_includes_xla_signature(tmp_path, monkeypatch):
    """When LLVM's live detection (the canary signature) shifts under an
    unchanged cpuinfo/gcc view — live migration — the guard must wipe."""
    import encodec_tpu.utils.cache as cache_mod
    cache_dir = tmp_path / "jc"
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: "aaaa")
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: "s1")
    guard_cache_host_fingerprint(str(cache_dir))
    assert (cache_dir / "HOST_FINGERPRINT").read_text() == "aaaa:s1"
    (cache_dir / "entry").write_text("x")
    guard_cache_host_fingerprint(str(cache_dir))   # unchanged: survives
    assert (cache_dir / "entry").exists()
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: "s2")
    guard_cache_host_fingerprint(str(cache_dir))   # detection shift: wiped
    assert not (cache_dir / "entry").exists()
    assert (cache_dir / "HOST_FINGERPRINT").read_text() == "aaaa:s2"


def test_xla_signature_live(monkeypatch):
    """The canary runs on this container (cpu platform forced by
    conftest): it must return a 16-hex digest, leave the session's
    persistent-cache config untouched, and be stable across calls."""
    import jax

    import encodec_tpu.utils.cache as cache_mod
    prev_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(cache_mod, "_xla_sig_cache", None)
    sig = cache_mod.xla_cpu_machine_signature()
    assert sig is not None and len(sig) == 16
    assert int(sig, 16) >= 0
    assert jax.config.jax_compilation_cache_dir == prev_dir
    assert cache_mod.xla_cpu_machine_signature() == sig


def test_guard_wipes_unmarked_nonempty_cache(tmp_path, monkeypatch):
    """A populated cache with NO marker predates the guard (or lost its
    marker): its host identity is unknown, so it must be wiped, not
    legitimized by stamping the current fingerprint over it."""
    import encodec_tpu.utils.cache as cache_mod
    cache_dir = tmp_path / "jc"
    os.makedirs(cache_dir)
    (cache_dir / "stale_aot_entry").write_text("x")
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: None)
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: "aaaa")
    guard_cache_host_fingerprint(str(cache_dir))
    assert not (cache_dir / "stale_aot_entry").exists()
    assert (cache_dir / "HOST_FINGERPRINT").read_text() == "aaaa"


def test_guard_fresh_empty_dir_just_stamps(tmp_path, monkeypatch):
    import encodec_tpu.utils.cache as cache_mod
    cache_dir = tmp_path / "jc"
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: None)
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: "aaaa")
    guard_cache_host_fingerprint(str(cache_dir))        # dir doesn't exist
    assert (cache_dir / "HOST_FINGERPRINT").read_text() == "aaaa"
    os.makedirs(tmp_path / "jc2")
    guard_cache_host_fingerprint(str(tmp_path / "jc2"))  # exists, empty
    assert (tmp_path / "jc2" / "HOST_FINGERPRINT").read_text() == "aaaa"


def test_guard_noop_when_unreadable(tmp_path, monkeypatch):
    import encodec_tpu.utils.cache as cache_mod
    cache_dir = tmp_path / "jc"
    os.makedirs(cache_dir)
    (cache_dir / "entry").write_text("x")
    monkeypatch.setattr(cache_mod, "xla_cpu_machine_signature", lambda: None)
    monkeypatch.setattr(cache_mod, "host_cpu_fingerprint", lambda: None)
    guard_cache_host_fingerprint(str(cache_dir))
    assert (cache_dir / "entry").exists()
