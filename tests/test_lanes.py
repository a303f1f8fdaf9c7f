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
    """Eligibility: f32 + >=1 full panel + B >= max(32, W/16) + TPU."""
    import os

    assert not pk.lanes_eligible(128, 64, np.float32)     # W < 128
    assert not pk.lanes_eligible(4, 256, np.float32)      # batch too small
    assert not pk.lanes_eligible(128, 256, np.float64)    # f64
    os.environ["CHOLESKY_TPU_LANES"] = "0"
    try:
        assert not pk.lanes_eligible(128, 256, np.float32)
    finally:
        del os.environ["CHOLESKY_TPU_LANES"]


def test_lanes_routing_rule():
    """The B >= max(32, W/16) crossover and the padded-slab HBM guard,
    pinned to the measured per-level-class shootout on the real chip
    (tools/bench_front_kernels.py; table in docs/performance.md). Backend
    gating is tested above; bypass it here to test the rule itself."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        import pytest

        # the backend gate would mask the rule; monkeypatch-free check via
        # direct predicate evaluation on the measured (B, W) points
        def rule(B, W):
            return (B >= pk.LANES_MIN_B and W >= pk.BS
                    and B * pk.LANES_W_PER_B >= W)

        assert rule(128, 864) and rule(64, 384) and rule(32, 512)
        assert rule(256, 256) and rule(512, 128)
        assert not rule(16, 640) and not rule(8, 768)
        assert not rule(4, 1024) and not rule(2, 1280) and not rule(1, 2504)
        pytest.skip("full lanes_eligible needs a TPU backend")
    # measured winners route to lanes; measured losers to XLA
    for (B, W) in [(128, 864), (64, 384), (32, 512), (256, 256), (512, 128)]:
        assert pk.lanes_eligible(B, W, np.float32)
    for (B, W) in [(16, 640), (8, 768), (4, 1024), (2, 1280), (1, 2504)]:
        assert not pk.lanes_eligible(B, W, np.float32)


def test_lanes_pad_guard():
    """Below a 128-front batch the batch-minor layout pads lanes to 128;
    the F-aware guard rejects slabs whose padded footprint exceeds the
    HBM budget."""
    # B=32, F=64k, W=512: padded slab = 128*64k*512*4 = 16 GiB > budget
    assert (-(-32 // pk.LANES_BT) * pk.LANES_BT * 65536 * 512 * 4
            > pk._LANES_PAD_BYTES)
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        assert not pk.lanes_eligible(32, 512, np.float32, F=65536)
        assert pk.lanes_eligible(32, 512, np.float32, F=1488)


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
