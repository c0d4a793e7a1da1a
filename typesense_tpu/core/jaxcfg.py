"""Central JAX configuration. Imported before any jax use.

x64 is enabled because ranking parity with the reference requires the exact
64-bit packed match score (match_score.h:56-68) and int64 sort columns; all
hot arrays (postings, positions, vectors) remain explicitly int32/bf16/f32 —
int64 appears only on candidate-sized score/sort vectors.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" via
# jax.config, which silently overrides the JAX_PLATFORMS env var. Re-assert
# the user's explicit choice so CPU-mesh tests really run on CPU.
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and _env_platforms != (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", _env_platforms)

# Persistent compilation cache: search kernels are compiled per shape bucket;
# cache them across processes (tests, server restarts, bench runs). Default
# lives inside the repo (gitignored) because /tmp does not survive VM resets
# — TPU kernel compiles cost ~40 s/shape through this toolchain, so losing
# the cache costs minutes of warmup on the next boot.
_default_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")
_cache_dir = os.environ.get("TS_JAX_CACHE_DIR", _default_cache)


def _cpu_fingerprint() -> str:
    """Hash of the host's CPU feature flags. XLA:CPU persists AOT-compiled
    machine code in the cache; this VM migrates across host CPU types
    between sessions, and loading an entry compiled for another host's
    features can SIGILL/segfault (observed: segv in
    backend_compile_and_load loading avx512/amx entries). Segregating the
    CPU-primary cache by feature set makes stale entries unreachable."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nofp"


_plats = (_env_platforms or jax.config.jax_platforms or "")
if _cache_dir and _plats.split(",")[0].strip() == "cpu":
    _cache_dir = f"{_cache_dir}_cpu_{_cpu_fingerprint()}"
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
