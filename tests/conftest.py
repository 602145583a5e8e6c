"""Test configuration: force a virtual 8-device CPU mesh before jax imports."""

import os
import sys

# Must happen before any backend is initialized. The container's
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so updating the
# env var alone is not enough — update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# f32 matmuls at full precision on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: most suite time is jit compilation that is
# identical across runs.
#
# Host-fingerprint guard: this container's virtual CPU advertises DIFFERENT
# feature sets across sessions (observed: amx-complex/avx10/prefer-no-*
# drift), and XLA:CPU loads feature-mismatched cached AOT executables with
# only a warning — mixing a stale cached executable with a freshly compiled
# one produced bitwise-divergent LM probabilities between two executables
# that must agree (caught by the entropy-codec checksum self-check, which
# then demoted decode to its fallback tier and flaked the primary-tier
# test). Wipe the cache whenever the host's CPU flags change.
_CACHE_DIR = os.path.join(REPO_ROOT, ".jax_cache")

from encodec_tpu.utils.cache import guard_cache_host_fingerprint  # noqa: E402

guard_cache_host_fingerprint(_CACHE_DIR)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "all")
except Exception:
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
