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
# cache them across processes (tests, server restarts, bench runs).
_cache_dir = os.environ.get("TS_JAX_CACHE_DIR", "/tmp/ts_jax_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
