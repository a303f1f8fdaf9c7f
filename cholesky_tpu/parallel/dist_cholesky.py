"""Collective (multi-chip) dense Cholesky for top-of-tree fronts.

The elimination-tree sharding in parallel/mesh.py replicates levels with
fewer separators than chips; for very large root fronts (a 128^3 grid has a
16384^2 root front) that wastes the mesh exactly where the FLOPs peak. This
module factors a single large front cooperatively: the front is sharded
column-block-wise over the 1-D mesh, and a right-looking blocked Cholesky
runs inside `shard_map` — per step, the active panel is broadcast with a
`psum` (the owner contributes, others zero), every chip redundantly factors
the small diagonal block (cheaper than a second broadcast), and each chip
updates only its own trailing columns. Per-step communication is one
[F, bs] all-reduce over ICI; compute is F^2·bs/ndev per chip per step.

This replaces the reference's implicit Legion/Realm distribution of the
root-separator POTRF chain (mmat.rg:1240-1245 at lvl=0) with explicit XLA
collectives — the "collective root-front factorization" of the rebuild plan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cholesky_tpu.parallel.mesh import TREE_AXIS
from cholesky_tpu.utils import round_up as _round_up


def distributed_cholesky(a: jax.Array, mesh: Mesh, block: int = 256) -> jax.Array:
    """Cholesky of an SPD matrix [F, F] (lower triangle referenced), computed
    cooperatively over `mesh`'s TREE_AXIS with column-block sharding.
    Returns L (lower triangular, zero above). jit-composable: sharding is
    applied with with_sharding_constraint, so this can be called inside a
    larger jitted program (the frontal engine's root-front path)."""
    ndev = int(mesh.devices.size)
    F = a.shape[0]
    Fp = _round_up(F, ndev * block)
    if Fp != F:
        pad = Fp - F
        a = jnp.pad(a, ((0, pad), (0, pad)))
        diag = jnp.arange(F, Fp)
        a = a.at[diag, diag].set(1.0)
    cols_per_dev = Fp // ndev
    nb = Fp // block

    a = jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P(None, TREE_AXIS)))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(None, TREE_AXIS),
        out_specs=P(None, TREE_AXIS))
    def _chol(local):                      # local: [Fp, cols_per_dev]
        d = lax.axis_index(TREE_AXIS).astype(jnp.int32)
        col0 = d * jnp.int32(cols_per_dev)  # global index of my first column
        rows = lax.broadcasted_iota(jnp.int32, (Fp, 1), 0)

        def step(k, local):
            kb = (k * block).astype(jnp.int32) if hasattr(k, 'astype') else jnp.int32(k * block)
            # 1) broadcast the current block column: owner contributes
            owner = (kb // cols_per_dev) == d
            loc_off = (kb - col0).astype(jnp.int32)
            zero = jnp.int32(0)
            safe_off = jnp.clip(loc_off, 0, cols_per_dev - block).astype(jnp.int32)
            my_panel = lax.dynamic_slice(local, (zero, safe_off), (Fp, block))
            panel = lax.psum(
                jnp.where(owner, my_panel, jnp.zeros_like(my_panel)),
                TREE_AXIS)                  # [Fp, block], pre-update col k
            # 2) redundant small factorization of the diagonal block
            dblk = lax.dynamic_slice(panel, (kb, zero), (block, block))
            ld = lax.linalg.cholesky(dblk, symmetrize_input=False)
            below = jnp.where(rows >= kb + block, panel, 0.0)
            x = lax.linalg.triangular_solve(
                ld, below, left_side=False, lower=True, transpose_a=True)
            lpanel = x + jnp.where(
                (rows >= kb) & (rows < kb + block),
                lax.dynamic_update_slice(jnp.zeros_like(panel), ld, (kb, zero)),
                0.0)
            # 3) owner stores the factored panel into its local columns
            stored = lax.dynamic_update_slice(local, lpanel, (zero, safe_off))
            local = jnp.where(owner, stored, local)
            # 4) trailing update of my columns: A[:, j] -= X row_j . X^T
            #    row of the panel corresponding to each of my columns
            xj = lax.dynamic_slice(x, (col0, zero), (cols_per_dev, block))
            cols_glob = col0 + lax.broadcasted_iota(
                jnp.int32, (1, cols_per_dev), 1)
            active = cols_glob >= kb + block       # columns right of panel
            upd = jnp.dot(x, xj.T, preferred_element_type=x.dtype)
            local = local - jnp.where(active, upd, 0.0)
            return local

        local = lax.fori_loop(jnp.int32(0), jnp.int32(nb), step, local)
        # zero strict upper triangle of my columns
        cols_glob = col0 + lax.broadcasted_iota(jnp.int32, (1, cols_per_dev), 1)
        return jnp.where(rows >= cols_glob, local, 0.0)

    out = _chol(a)
    return out[:F, :F]
