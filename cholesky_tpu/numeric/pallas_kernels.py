"""Pallas TPU kernels for the frontal engine's hot per-level stages.

The dominant non-matmul cost in the level loop is the batched partial front
factorization: Cholesky of the [W, W] pivot block plus the triangular solve
of the [F-W, W] boundary strip. XLA lowers batched Cholesky to an unblocked
column-at-a-time While loop over HBM-resident arrays (~n sequential passes of
full-array traffic); for the many small/mid fronts of a deep elimination
tree that is bandwidth-bound and slow. This kernel keeps each front's
[F, W] pivot-column slab resident in VMEM, runs a blocked right-looking
Cholesky (128-wide panels), inverts each 128x128 diagonal factor in-register,
and turns every panel solve and trailing update into an MXU matmul.

Pallas TPU lowering notes: values inside the kernel cannot be
dynamic-sliced, so the per-column recurrences use masked whole-block ops
(row/column extraction by iota comparison — 128x128 VPU work per step), and
all block movement uses static slices on the output ref.

One pallas_call per tree level, grid over the batch of fronts. Falls back to
the XLA path when the slab exceeds the VMEM budget (top-of-tree fronts,
which are matmul-dominated anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128                        # panel width (MXU native)
VMEM_BUDGET = 10 * 1024 * 1024  # slab bytes allowed in VMEM


def _chol_unblocked(d):
    """Cholesky of a [BS, BS] SPD block (lower), column-at-a-time recurrence
    with masked whole-block extraction (no dynamic slicing)."""
    n = d.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, L):
        # L[j, :j] as a [1, n] masked row
        lj_row = jnp.sum(jnp.where((rows == j) & (cols < j), L, 0.0),
                         axis=0, keepdims=True)
        acc = jnp.dot(L, lj_row.T, preferred_element_type=jnp.float32)
        dj = jnp.sum(jnp.where(cols == j, d, 0.0), axis=1, keepdims=True)
        aj = dj - acc                                        # [n, 1]
        piv = jnp.sum(jnp.where(rows[:, :1] == j, aj, 0.0))
        colv = aj * lax.rsqrt(piv)
        colv = jnp.where(rows[:, :1] >= j, colv, 0.0)
        return jnp.where(cols == j, colv, L)

    return lax.fori_loop(0, n, body, jnp.zeros_like(d))


def _tri_inv_lower(L):
    """Inverse of a lower-triangular [BS, BS] factor: forward substitution
    row by row — M[i, :] = (I[i, :] - L[i, :i] @ M[:i, :]) / L[i, i]."""
    n = L.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rows == cols).astype(L.dtype)

    def body(i, M):
        li = jnp.sum(jnp.where((rows == i) & (cols < i), L, 0.0),
                     axis=0, keepdims=True)                  # [1, n] = L[i, :i]
        acc = jnp.dot(li, M, preferred_element_type=jnp.float32)
        ei = jnp.where(cols[:1, :] == i, 1.0, 0.0)
        piv = jnp.sum(jnp.where((rows == i) & (cols == i), L, 0.0))
        row = (ei - acc) / piv
        return jnp.where(rows == i, row, M)

    return lax.fori_loop(0, n, body, jnp.zeros_like(L))


def _front_factor_kernel(a_ref, out_ref, *, F, W):
    """Partial factorization of one [F, W] front slab (pivot columns)."""
    out_ref[0] = a_ref[0]
    nb = W // BS
    for k in range(nb):                      # static unroll
        c0 = k * BS
        d = out_ref[0, c0:c0 + BS, c0:c0 + BS]
        ld = _chol_unblocked(d)
        out_ref[0, c0:c0 + BS, c0:c0 + BS] = ld
        if F - c0 - BS > 0:
            minv = _tri_inv_lower(ld)
            b = out_ref[0, c0 + BS:, c0:c0 + BS]
            t = jnp.dot(b, minv.T, preferred_element_type=jnp.float32)
            out_ref[0, c0 + BS:, c0:c0 + BS] = t
            rem = W - c0 - BS
            if rem > 0:
                t_cols = t[:rem, :]
                upd = jnp.dot(t, t_cols.T,
                              preferred_element_type=jnp.float32)
                out_ref[0, c0 + BS:, c0 + BS:] = (
                    out_ref[0, c0 + BS:, c0 + BS:] - upd)


def front_factor_small(fronts_piv: jax.Array, F: int, W: int) -> jax.Array:
    """Batched partial front factorization: [B, F, W] -> [B, F, W] with the
    pivot Cholesky in rows [:W] (junk above the diagonal is not cleared) and
    the solved boundary strip in rows [W:]. Requires W % 128 == 0 and the
    slab under the VMEM budget."""
    B = fronts_piv.shape[0]
    kernel = functools.partial(_front_factor_kernel, F=F, W=W)
    flops = int(B * (W ** 3 // 3 + (F - W) * W * W + W * BS * BS))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, F, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, F, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, W), fronts_piv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * B * F * W * 4, transcendentals=0),
    )(fronts_piv)


def pallas_eligible(F: int, W: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    return (W % BS == 0 and F * W * itemsize <= VMEM_BUDGET
            and jnp.dtype(dtype) == jnp.float32)
