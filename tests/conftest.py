"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; JAX can emulate an N-device
platform on CPU, which exercises the exact same sharding/collective code paths
the TPU mesh uses.  On CPU, float64 is native, so differential tests against
scipy are exact-parity.

The container pre-registers a tunneled single-TPU backend at interpreter
startup (sitecustomize) with ``JAX_PLATFORMS=axon`` already in the
environment, so plain env-var defaults are too late: we must flip the platform
via ``jax.config`` and drop the already-initialized backend cache.  Set
``SMM_TESTS_ON_TPU=1`` to run the suite on the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import before backend selection is fine)

# Scope the persistent compile cache per backend: TPU and the virtual CPU
# mesh sharing one directory makes XLA's CPU AOT loader warn about machine
# features on every run (it scans the TPU entries).
_cache_root = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update(
    "jax_compilation_cache_dir",
    _cache_root if os.environ.get("SMM_TESTS_ON_TPU") else os.path.join(_cache_root, "cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not os.environ.get("SMM_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb  # noqa: E402

    if _xb.backends_are_initialized():
        _xb._clear_backends()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running (large problem sizes)")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU device")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
