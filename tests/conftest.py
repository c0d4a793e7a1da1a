"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip)."""

import os

# FORCE cpu (not setdefault): the environment often carries JAX_PLATFORMS=axon
# pointing at the real TPU tunnel; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import typesense_tpu.core.jaxcfg  # noqa: F401,E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_executable_accumulation():
    """XLA:CPU segfaults inside backend_compile_and_load after ~600
    compile-heavy tests in one process (jaxlib 0.9; reproduced twice at the
    same suite position, passes in either half alone). Dropping compiled
    executables between modules keeps the process under the crash
    threshold; the persistent compilation cache makes re-tracing cheap."""
    yield
    import jax
    jax.clear_caches()


@pytest.fixture()
def tmp_store(tmp_path):
    from typesense_tpu.core.store import Store
    s = Store(str(tmp_path / "store"))
    yield s
    s.close()
