"""Batch-in-lanes pallas kernels (numeric/pallas_kernels.py).

The lanes kernels are TPU-only production paths (lanes_eligible gates on
backend); interpret-mode execution of the 256-step unrolled kernel takes
minutes on CPU, so full-kernel parity runs only when a TPU is attached.
The driver's bench gate exercises the path on real hardware every round.
"""

import numpy as np
import pytest

import jax

from cholesky_tpu.numeric import pallas_kernels as pk


def test_lanes_gating():
    """Eligibility: f32 + >=1 full panel + batch >= 8 + TPU backend."""
    import os

    assert not pk.lanes_eligible(128, 64, np.float32)     # W < 128
    assert not pk.lanes_eligible(4, 256, np.float32)      # batch too small
    assert not pk.lanes_eligible(128, 256, np.float64)    # f64
    os.environ["CHOLESKY_TPU_LANES"] = "0"
    try:
        assert not pk.lanes_eligible(128, 256, np.float32)
    finally:
        del os.environ["CHOLESKY_TPU_LANES"]


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="lanes kernels are TPU-only (interpret mode of "
                           "the unrolled kernel takes minutes)")
def test_chol_inv_lanes_tpu():
    from jax import lax, random
    import jax.numpy as jnp

    k = random.PRNGKey(0)
    g = random.normal(k, (16, 128, 128), jnp.float32)
    spd = jnp.einsum("bik,bjk->bij", g, g) + 128 * jnp.eye(128)[None]
    L, M = pk.chol_inv_lanes(spd)
    Lref = lax.linalg.cholesky(spd, symmetrize_input=False)
    assert float(jnp.max(jnp.abs(jnp.tril(L) - Lref))) < 1e-3
    eye = jnp.einsum("bij,bjk->bik", L, M)
    assert float(jnp.max(jnp.abs(eye - jnp.eye(128)[None]))) < 1e-3
