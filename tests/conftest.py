"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-device testing strategy from SURVEY.md §4: sharding tests
run against `--xla_force_host_platform_device_count=8` CPU devices so the
full dp mesh paths compile and execute without TPU hardware.

NOTE: this environment's sitecustomize force-registers the axon TPU backend
and overrides JAX_PLATFORMS from the environment, so the env var alone is
NOT enough — jax.config.update('jax_platforms', 'cpu') below is what actually
keeps tests off the (single, shared) TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: re-running the suite skips recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must not run on the shared TPU chip"
    )
    assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"
