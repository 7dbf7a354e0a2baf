"""Persistent-compilation-cache policy: TPU only.

Two observed failure modes make the on-disk cache unsafe for the CPU
backend in this environment:

  * JAX's cache key does NOT include the host CPU's ISA features: a CPU
    AOT executable cached on one machine (e.g. with AMX/AVX512 +
    prefer-no-scatter) deserializes on a different host and
    SIGILLs/SIGSEGVs at load (cpu_aot_loader warns, then dies mid-suite).
  * Concurrent processes sharing the cache directory (a test run racing a
    background suite) produce entries whose deserialization SIGABRTs,
    even on one host (also documented at tests/test_multihost.py:38-40).

TPU entries have neither problem — they target the chip, not the host,
and TPU work here runs in one batched process (CLAUDE.md) — and they are
the expensive compiles (~1-2 s each through the remote-compile relay), so
the cache is enabled only when the active backend is TPU. The directory
is still keyed by a host fingerprint for belt-and-braces isolation.
"""

from __future__ import annotations

import hashlib
import os


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            lines = [
                ln for ln in f
                if ln.startswith(("model name", "flags"))
            ]
        text = "".join(sorted(set(lines)))
    except OSError:
        import platform

        text = platform.processor() or platform.machine()
    return hashlib.sha256(text.encode()).hexdigest()[:12]


def cache_dir(repo_root: str | None = None) -> str:
    override = os.environ.get("CSTPU_CACHE_DIR")
    if override:  # measurement hook: enumerate a run's executables
        return os.path.abspath(override)
    if repo_root is None:
        repo_root = os.path.join(os.path.dirname(__file__), "..", "..")
    return os.path.abspath(
        os.path.join(repo_root, ".jax_cache", _cpu_fingerprint())
    )


def configure(jax_config, platform: str | None = None) -> None:
    """Enable the persistent cache iff the active backend is a TPU.

    ``platform`` is the configured backend name if the caller knows it;
    None means "ask jax.config" (works before devices are initialized).
    """
    if platform is None:
        platform = jax_config.jax_platforms or ""
    if not platform:
        # Unknown platform string: resolve the ACTUAL backend (this
        # initializes devices — fine for the apps, which are about to use
        # them). Guessing from config alone previously enabled the cache on
        # hosts that resolve to CPU, re-exposing the AOT crash modes above.
        try:
            import jax

            platform = jax.default_backend()
        except Exception:
            platform = "cpu"  # can't tell -> fail safe (cache off)
    platform = platform.lower()
    # Enable ONLY when the backend is affirmatively a TPU ("tpu", or this
    # sandbox's "axon" relay backend).
    is_tpu = platform.startswith(("tpu", "axon"))
    if not is_tpu:
        jax_config.update("jax_compilation_cache_dir", "")
        return
    jax_config.update("jax_compilation_cache_dir", cache_dir())
    jax_config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
