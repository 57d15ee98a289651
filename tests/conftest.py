"""Test configuration.

Multi-device testing follows the TPU-native equivalent of a fake
distributed backend: an 8-way virtual CPU mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4). x64 is enabled
so numerical parity tests against the float64 numpy oracle are tight; the
library itself is dtype-polymorphic (f32 on TPU).
"""

import os

# Force CPU for tests even when the session env points JAX at a TPU
# (e.g. JAX_PLATFORMS=axon) and even when jax is preloaded at interpreter
# startup: the runtime config override works as long as no backend has been
# initialised yet. Tests need the 8-device virtual mesh and f64.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated on
# this class of host, and the rare XLA-CPU compile segfault (observed
# under high accumulated RSS, see scripts/run_tests.py) makes retries
# routine — with the cache, a retried shard (and every rerun) skips
# straight past the compiles that already succeeded.
_cache_dir = os.environ.get("MADICP_XLA_CACHE", "/tmp/madicp_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def four_walls_cloud(rng, wall_height=2.0, wall_width=4.0, points_per_wall=1000):
    """Synthetic four-walls-plus-floor fixture (the reference's standard
    deterministic demo scene, ``tools_utils.py:3-21``)."""

    def plane(xr, yr, zr, n):
        x = rng.uniform(xr[0], xr[1], n)
        y = rng.uniform(yr[0], yr[1], n)
        z = rng.uniform(zr[0], zr[1], n)
        return np.column_stack([x, y, z])

    w = wall_width
    h = wall_height
    n = points_per_wall
    return np.vstack(
        [
            plane([0, w], [0, 0], [0, h], n),
            plane([0, w], [w, w], [0, h], n),
            plane([0, 0], [0, w], [0, h], n),
            plane([w, w], [0, w], [0, h], n),
            plane([0, w], [0, w], [0, 0], n),
        ]
    )


@pytest.fixture
def four_walls(rng):
    return four_walls_cloud(rng)
