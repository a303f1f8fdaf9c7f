"""Multi-slice (DCN-aware) mesh tests on the 8-virtual-CPU-device mesh:
2 slices x 4 chips. The reference reaches multi-node scale through
Legion/Realm moving regions over GASNet (SURVEY §5; placement policy
cholesky.cc:55-73); here the same reach is an explicit 2-axis
(slice, tree) jax.sharding.Mesh whose layout keeps sibling subtrees
intra-slice and confines the root front's heavy broadcasts to ICI
(parallel/mesh.make_multislice_mesh, dist_cholesky.distributed_cholesky_2d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random
from jax.sharding import PartitionSpec as P

from cholesky_tpu import SparseCholesky
from cholesky_tpu.parallel.dist_cholesky import (
    _is_multislice, _pick_scheme, collective_cholesky, distributed_cholesky,
    distributed_cholesky_2d)
from cholesky_tpu.parallel.mesh import (
    DCN_AXIS, TREE_AXIS, make_mesh, make_multislice_mesh, panel_sharding,
    rhs_sharding, slot_axes)
from cholesky_tpu.utils.laplacian import generate_problem


@pytest.fixture(scope="module")
def msmesh():
    assert len(jax.devices()) >= 8
    return make_multislice_mesh(2, 4)


def test_mesh_construction(msmesh):
    assert msmesh.axis_names == (DCN_AXIS, TREE_AXIS)
    assert msmesh.devices.shape == (2, 4)
    assert slot_axes(msmesh) == (DCN_AXIS, TREE_AXIS)
    assert _is_multislice(msmesh)
    # chips_per_slice inferred from the device count
    m = make_multislice_mesh(4)
    assert m.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_multislice_mesh(3)
    # degenerate shapes are NOT multislice-routed (no ICI to prefer)
    assert not _is_multislice(make_mesh(8))
    assert not _is_multislice(make_multislice_mesh(8, 1))


def test_sharding_policy_multislice(msmesh):
    """Wide levels shard the slot axis over the COMBINED (slice, tree)
    axes; the device order is slice-major, so each slice owns a contiguous
    slot range (sibling pairs cross the DCN only at the one slice
    boundary)."""
    s3 = panel_sharding(msmesh, 3)    # 8 slots on 2x4 devices
    assert s3.spec == P((DCN_AXIS, TREE_AXIS), None, None)
    # narrow level: each front owned by one slice's chips (fb = slice
    # axis under slice-major flattening), rows over its ICI subgroup
    s1 = panel_sharding(msmesh, 1)
    assert s1.spec == P("fb", "rg", None)
    fb_groups = s1.mesh.devices          # [2, 4]
    assert set(fb_groups[0].flat) == set(msmesh.devices[0].flat)
    assert rhs_sharding(msmesh, 4).spec == P((DCN_AXIS, TREE_AXIS), None)
    # slot -> device map: slots [0..3] on slice 0, [4..7] on slice 1
    arr = jax.device_put(np.zeros((8, 4, 4)), s3)
    by_dev = {d: idx for d, idx in arr.sharding.devices_indices_map(
        (8, 4, 4)).items()}
    slice0 = set(msmesh.devices[0].flat)
    for d, idx in by_dev.items():
        lo = idx[0].start or 0
        assert (lo // 4) == (0 if d in slice0 else 1)


def test_pick_scheme_multislice(msmesh, monkeypatch):
    """Multi-slice meshes route 2-D even where a flat 8-device mesh keeps
    1-D (short panels): the 1-D all-reduce would cross the DCN every
    step."""
    monkeypatch.delenv("CHOLESKY_TPU_ROOT_SCHEME", raising=False)
    flat = make_mesh(8)
    assert _pick_scheme(2048, 8, 256, flat) == "1d"      # short panel
    assert _pick_scheme(2048, 8, 256, msmesh) == "2d"
    monkeypatch.setenv("CHOLESKY_TPU_ROOT_SCHEME", "1d")
    assert _pick_scheme(2048, 8, 256, msmesh) == "1d"    # explicit override


@pytest.mark.parametrize("F,blk", [(512, 64), (1000, 64)])
def test_root_front_2d_on_multislice(F, blk, msmesh):
    """The 2-D block-cyclic root front on the topology-mapped grid
    (rg=intra-slice chips, cg=slices) matches LAPACK."""
    k = random.PRNGKey(0)
    g = random.normal(k, (F, F), jnp.float64) / np.sqrt(F)
    spd = g @ g.T + 4.0 * jnp.eye(F, dtype=jnp.float64)
    L = distributed_cholesky_2d(spd, msmesh, block=blk)
    Lref = np.linalg.cholesky(np.asarray(spd))
    np.testing.assert_allclose(np.asarray(L), Lref, rtol=1e-10, atol=1e-9)
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


def test_root_front_1d_flattened_on_multislice(msmesh):
    """Forced 1-D on a multislice mesh exercises the flattened
    (slice*chips) device-index path and still matches LAPACK."""
    k = random.PRNGKey(1)
    F = 768
    g = random.normal(k, (F, F), jnp.float64) / np.sqrt(F)
    spd = g @ g.T + 4.0 * jnp.eye(F, dtype=jnp.float64)
    L = distributed_cholesky(spd, msmesh, block=64)
    Lref = np.linalg.cholesky(np.asarray(spd))
    np.testing.assert_allclose(np.asarray(L), Lref, rtol=1e-10, atol=1e-9)


def test_collective_routing_on_multislice(msmesh, monkeypatch):
    monkeypatch.delenv("CHOLESKY_TPU_ROOT_SCHEME", raising=False)
    k = random.PRNGKey(2)
    F = 512
    g = random.normal(k, (F, F), jnp.float64) / np.sqrt(F)
    spd = g @ g.T + 4.0 * jnp.eye(F, dtype=jnp.float64)
    L = collective_cholesky(spd, msmesh, block=64)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(spd)),
        rtol=1e-10, atol=1e-9)


def test_full_solver_on_multislice(msmesh):
    """End-to-end factorize+solve with slot panels sharded over the
    (slice, tree) axes — GSPMD inserts the boundary collectives; answers
    identical to the flat-mesh and single-device placements."""
    n, r, c, v, o, cl, b = generate_problem((24, 24), 5)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, mesh=msmesh)
    s.factorize()
    assert len(s.panels[4].sharding.device_set) == 8
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10
    s1 = SparseCholesky.from_coo(n, r, c, v, o, cl)
    np.testing.assert_allclose(x, s1.solve(b), rtol=1e-12, atol=1e-12)


def test_fp32_production_on_multislice(msmesh):
    """The flagship fp32+IR production config under the multislice mesh,
    gated at the 1e-10 contract."""
    n, r, c, v, o, cl, b = generate_problem((24, 24), 5)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32,
                                mesh=msmesh)
    s.factorize()
    x = s.solve(b, tol=1e-10)
    assert s.residual(b, x) <= 1e-10


def test_collective_root_in_solver_multislice(msmesh, monkeypatch):
    """Full distributed solve on the multislice mesh with the collective
    root forced on: the router must pick the 2-D topology-mapped scheme
    (spy asserts), and the answer matches the single-device path."""
    from cholesky_tpu.parallel import dist_cholesky as dc

    calls = []
    real = dc.distributed_cholesky_2d

    def spy(a, m, block=256):
        calls.append(m.axis_names)
        return real(a, m, block=block)

    monkeypatch.setattr(dc, "distributed_cholesky_2d", spy)
    monkeypatch.setenv("CHOLESKY_TPU_ROOT_DIST_MIN", "16")
    monkeypatch.delenv("CHOLESKY_TPU_ROOT_SCHEME", raising=False)
    n, r, c, v, o, cl, b = generate_problem((20, 24), 5)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, mesh=msmesh)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10
    assert calls and calls[0] == (DCN_AXIS, TREE_AXIS), calls
    s2 = SparseCholesky.from_coo(n, r, c, v, o, cl)
    np.testing.assert_allclose(x, s2.solve(b), rtol=1e-9, atol=1e-9)


def test_cli_multislice(tmp_path):
    """--slices 2 --devices 8 through the CLI subprocess on a reference
    fixture: the driver builds the multislice mesh and still meets the
    reference harness contract."""
    import os
    import subprocess
    import sys

    base = "/root/reference/tests/lapl_25x25"
    sol = str(tmp_path / "solution.txt")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "cholesky_tpu.cli",
         "-i", f"{base}/lapl_5_2.mtx", "-s", f"{base}/lapl_5_2_ord_3.txt",
         "-c", f"{base}/lapl_5_2_clust_3.txt", "-b", f"{base}/B_25x1.mtx",
         "-o", sol, "--devices", "8", "--slices", "2"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "Done solve." in r.stdout
    import scipy.linalg

    from cholesky_tpu.io import mmio

    a = mmio.read_dense(f"{base}/lapl_5_2.mtx")
    b = mmio.read_array(f"{base}/B_25x1.mtx")
    x = np.genfromtxt(sol).reshape(b.shape)
    assert np.allclose(x, scipy.linalg.solve(a, b), rtol=1e-6, atol=1e-6)


def test_family_on_multislice(msmesh):
    """factorize_many shards the SYSTEM axis over all 8 chips of the
    2-axis mesh (slice-major): independent systems never touch the DCN."""
    n, r, c, v, o, cl, b = generate_problem((12, 12), 3)
    rng = np.random.default_rng(7)
    k = 8
    vals = (1.0 + rng.uniform(0, 2, size=k))[:, None] * v[None, :]
    vals[:, r == c] += rng.uniform(0, 1, size=(k, int((r == c).sum())))
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, mesh=msmesh)
    bf = s.factorize_many(vals)
    assert len(bf.factors[0].sharding.device_set) == 8
    B = rng.standard_normal((k, n))
    X = bf.solve(B)
    assert np.all(bf.residual(B, X) <= 1e-10)
