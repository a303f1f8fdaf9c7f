"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the bench/driver runs the real chip). Must be
set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import cholesky_tpu  # noqa: E402

cholesky_tpu.enable_x64()

import jax  # noqa: E402

# this image's jax build force-prepends the TPU platform regardless of
# JAX_PLATFORMS; override via config so tests run on 8 virtual CPU devices
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/cholesky_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")

FIXTURES = {
    "lapl_9x9": ("lapl_3_2.mtx", "lapl_3_2_ord_2.txt", "lapl_3_2_clust_2.txt", "B_9x1.mtx"),
    "lapl_25x25": ("lapl_5_2.mtx", "lapl_5_2_ord_3.txt", "lapl_5_2_clust_3.txt", "B_25x1.mtx"),
    "lapl_400x400": ("lapl_20_2.mtx", "lapl_20_2_ord_5.txt", "lapl_20_2_clust_5.txt", "B_400x1.mtx"),
    "lapl_3375x3375": ("lapl_15_3.mtx", "lapl_15_3_ord_5.txt", "lapl_15_3_clust_5.txt", "B_3375x1.mtx"),
}


def fixture_paths(name):
    mtx, ordf, clustf, bf = FIXTURES[name]
    d = REFERENCE_TESTS / name
    return {
        "mat": str(d / mtx),
        "separators": str(d / ordf),
        "clusters": str(d / clustf),
        "b": str(d / bf),
    }


@pytest.fixture
def rng():
    return np.random.default_rng(0)
