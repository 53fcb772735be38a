"""Test harness: force an 8-device virtual CPU mesh and float64.

The dev image registers an `axon` TPU backend via sitecustomize and pins
``JAX_PLATFORMS=axon`` in the environment, so plain env-var overrides do NOT
work; we must override via ``jax.config`` after import but before backend
initialisation.  The reference code is float64 throughout; tests validate
numerics at f64 on CPU, while TPU production runs use f32/bf16 (see bench.py).
"""
import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# silence the per-load AOT "machine feature" warnings from the persistent
# cache (XLA pseudo-features like prefer-no-scatter trip a string diff;
# compile and execution happen on the same host)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite is dominated by XLA-CPU compiles
# of large scan graphs (30-90 s each); caching them on disk makes re-runs
# compile-free (measured 39 s -> 3.8 s for the pulsatile length-27 scan).
# Keys include the HLO, so source changes invalidate automatically.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="module", autouse=True)
def _shed_compiler_state():
    """Drop accumulated compiled executables between test modules.

    The XLA CPU compiler segfaults nondeterministically (~50% of full-suite
    runs, always in `backend_compile` of a LATE module's big scan graph —
    observed in test_sharding and test_pulsatile on different runs) once a
    long pytest process has accumulated hundreds of compiled programs.
    Clearing the executable caches at module boundaries keeps the native
    compiler state small; module-scoped fixtures recompile, which costs
    ~1 min across the suite and has eliminated the crash in validation
    runs."""
    jax.clear_caches()
    yield
