"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

The container's sitecustomize registers the remote `axon` TPU backend and
pins jax_platforms to it; every eager op would compile over the tunnel.
Re-pin to CPU before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Per-run compile-cache dir: a SHARED cache dir can be poisoned by a
# concurrently killed run and SIGSEGV inside JAX's cache write (round-4
# post-mortem: one gate run died RC=139 in compilation_cache.put_executable).
# Caching still pays within a run (fixtures re-jit across modules under
# pytest-forked-style isolation is not used here, but repeated jits of the
# same kernel across tests in one process hit the in-memory cache anyway);
# the on-disk dir is unique per run and removed at exit.
_cache_dir = tempfile.mkdtemp(prefix="jax_cache_test_")
atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
