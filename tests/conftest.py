"""Test env: force CPU backend with 8 virtual devices so mesh/sharding code
runs without TPU hardware (the TPU-native analogue of a fake backend;
SURVEY.md §4).

Note: the host image's sitecustomize registers a remote-TPU PJRT plugin and
force-selects it through ``jax.config`` (env vars alone don't help, and its
backend init blocks for minutes on a pool claim). ``jax.config.update`` after
import is the reliable way to pin tests to CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

from stable_diffusion_training_tpu.utils.hostcache import (  # noqa: E402
    prepare_cache_dir as _prepare_cache_dir,
)

# persistent XLA compile cache shared by the whole suite: the fused train
# step compiles once per (shape, statics) across ALL test sessions — the
# single biggest lever for suite wall-clock on 1-core CI boxes. Repo-local
# (gitignored) so it survives /tmp wipes between sessions, keyed by the
# host CPU fingerprint (flags + model name + jaxlib) so rotated boxes never
# load foreign executables; stale-keyed sibling dirs are purged.
try:
    _cache_dir = _prepare_cache_dir(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".cache",
        ),
        "jax_pytest",
    )
except OSError:
    _cache_dir = "/tmp/jax_cache_pytest"
    os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    XLA:CPU's executable load path (fresh compiles AND persistent-cache
    deserialization) segfaults sporadically once a long-lived process has
    accumulated ~170 tests' worth of live programs; dropping the pjit
    executable cache between modules keeps the live set small. Warm
    persistent-cache reads make the recompiles cheap."""
    yield
    jax.clear_caches()
