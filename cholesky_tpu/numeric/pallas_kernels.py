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


def _nondefault_matmul_precision() -> bool:
    """True when a jax.default_matmul_precision context is raising matmul
    precision. The Mosaic lowering of these kernels' dots/reductions crashes
    the TPU worker under multi-pass precision emulation (measured: immediate
    worker restart at 50^3 under "high"/"highest"), and the kernels' whole
    point is one-pass MXU throughput — under a raised-precision factorization
    the XLA paths are both correct and the ones whose precision the caller
    is paying for."""
    v = jax.config.jax_default_matmul_precision
    return v not in (None, "default", "bfloat16")


def pallas_eligible(F: int, W: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    return (W % BS == 0 and F * W * itemsize <= VMEM_BUDGET
            and jnp.dtype(dtype) == jnp.float32
            and not _nondefault_matmul_precision())


# ---------------------------------------------------------------------------
# Batch-in-lanes diagonal-block kernels (production path).
#
# The sequential part of every level's factorization is the [B, 128, 128]
# diagonal-block Cholesky (and the solves against it). XLA lowers batched
# Cholesky to a column-at-a-time While loop whose per-step work is a few
# [128, 128] ops — VPU-starved and HBM-resident (13.3 ms at [896, 128, 128]).
# These kernels transpose the batch into the LANE dimension ([i, k, b]
# layout), statically unroll the 128-step recurrences, and keep everything
# in VMEM: every step's mask is a compile-time constant and every vector op
# runs 128 fronts wide (2.7 ms for the same shape, 4.9x).
#
# The inverse is computed in the same kernel so panel solves and the
# boundary-strip TRSM become MXU matmuls (X = B @ inv(L)^T) instead of
# latency-bound vector triangular solves (blas.rg dtrsm parity,
# blas.rg:99-135; error is O(kappa_block * eps) — identical order to
# substitution, and the factorization is consumed through iterative
# refinement anyway).

LANES_BT = 128          # batch tile (lane width)
_LANES_VMEM = 100 * 1024 * 1024


def _chol_inv_lanes_kernel(a_ref, l_ref, m_ref):
    N = a_ref.shape[0]
    A = a_ref[...]                                       # [N, N, BT]
    L = jnp.zeros_like(A)
    row1 = lax.broadcasted_iota(jnp.int32, (N, 1), 0)    # over i
    col3 = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)  # over k
    for j in range(N):       # static unroll: masks/slices are constants
        colv = A[:, j, :] * lax.rsqrt(A[j, j, :])[None, :]
        colv = jnp.where(row1 >= j, colv, 0.0)
        L = jnp.where(col3 == j, colv[:, None, :], L)
        # rank-1 update; entries at row/col <= j are dead after this step
        A = A - colv[:, None, :] * colv[None, :, :]
    l_ref[...] = L
    # forward substitution rows of inv(L): M[i,:] = (e_i - L[i,:i] M) / L[i,i]
    M = jnp.zeros_like(L)
    row3 = lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
    for i in range(N):
        lrow = L[i, :, :]                                # [N(l), BT]
        acc = jnp.sum(M * lrow[:, None, :], axis=0)      # [N(k), BT]
        ei = jnp.where(row1 == i, 1.0, 0.0)              # [N, 1] over k
        rowv = (ei - acc) / L[i, i, :][None, :]
        rowv = jnp.where(row1 <= i, rowv, 0.0)
        M = jnp.where(row3 == i, rowv[None, :, :], M)
    m_ref[...] = M


def chol_inv_lanes(d: jax.Array, interpret: bool = False):
    """Batched Cholesky + lower-triangular inverse of [B, 128, 128] SPD
    blocks, batch in lanes. Returns (L, inv(L)), both [B, 128, 128] lower.
    B is padded to a multiple of 128 with identity blocks."""
    B, N, _ = d.shape
    Bp = -(-B // LANES_BT) * LANES_BT
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=d.dtype), (Bp - B, N, N))
        d = jnp.concatenate([d, eye], axis=0)
    dt = jnp.transpose(d, (1, 2, 0))                     # [N, N, Bp]
    spec = pl.BlockSpec((N, N, LANES_BT), lambda b: (0, 0, b),
                        memory_space=pltpu.VMEM)
    l_t, m_t = pl.pallas_call(
        _chol_inv_lanes_kernel,
        grid=(Bp // LANES_BT,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((N, N, Bp), d.dtype),
                   jax.ShapeDtypeStruct((N, N, Bp), d.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_LANES_VMEM),
        interpret=interpret,
    )(dt)
    return (jnp.transpose(l_t, (2, 0, 1))[:B],
            jnp.transpose(m_t, (2, 0, 1))[:B])


def factor_slab_lanes(a: jax.Array, W: int, interpret: bool = False):
    """Blocked LEFT-looking partial factorization of the pivot-column slab
    [B, F, W]: rows [:W] become the pivot Cholesky, rows [W:] the solved
    boundary strip — the leaf/level kernel sequence (POTRF + TRSM,
    mmat.rg:1240-1274) with the sequential diagonal work in the lanes kernel
    and everything else as MXU matmuls.

    Left-looking: each panel gathers ALL updates from previously factored
    column blocks in one einsum, so every output column block is written
    exactly once. The right-looking form (trailing `.at[].add` after each
    panel) re-reads and re-writes the whole trailing submatrix per step —
    ~2x the HBM traffic; measured 22.0 -> 9.2 ms on the 50^3 leaf slab
    [128, 1440, 864]."""
    B, F, Wc = a.shape
    assert Wc == W
    nb = -(-W // BS)
    cols = []                       # factored column blocks [B, F - c0, w]
    for k in range(nb):
        c0 = k * BS
        w = min(BS, W - c0)
        pan = a[:, c0:, c0:c0 + w]                     # [B, F-c0, w]
        if k > 0:
            # rows c0.. of every past column block, one [B, F-c0, c0] slab
            tpast = jnp.concatenate(
                [cols[j][:, c0 - j * BS:, :] for j in range(k)], axis=2)
            tw = tpast[:, :w, :]                       # rows c0..c0+w
            pan = pan - jnp.einsum("bmj,bkj->bmk", tpast, tw,
                                   preferred_element_type=a.dtype)
        d = pan[:, :w, :w]
        if w == BS:
            ld, dinv = chol_inv_lanes(d, interpret=interpret)
        else:
            # Tail panel narrower than 128: run it through the lanes kernel
            # too, identity-padded to [B, 128, 128] (Cholesky of
            # blockdiag(d, I) is blockdiag(chol(d), I) — exact). XLA's
            # batched triangular_solve is avoided deliberately: its
            # diag-block-invert custom call allocates scoped VMEM
            # proportional to batch and fails to compile at the
            # [4096, 88, 88] tail of a 1M-dof leaf level.
            eye = jnp.eye(BS, dtype=a.dtype)
            d_pad = jnp.broadcast_to(eye, (B, BS, BS)).at[:, :w, :w].set(d)
            ld_p, minv_p = chol_inv_lanes(d_pad, interpret=interpret)
            ld, dinv = ld_p[:, :w, :w], minv_p[:, :w, :w]
        below = pan[:, w:, :]
        x = jnp.einsum("bmj,bij->bmi", below, dinv,
                       preferred_element_type=a.dtype)
        cols.append(jnp.concatenate([ld, x], axis=1))  # [B, F-c0, w]
    out = jnp.zeros_like(a)
    for k in range(nb):
        c0 = k * BS
        out = out.at[:, c0:, c0:c0 + cols[k].shape[2]].set(cols[k])
    return out


LANES_MIN_B = 64   # min batch: XLA lays the slab out batch-minor to feed the
                   # kernel's [F, W, B] transpose, padding B to 128 lanes —
                   # at B=8 that is a 16x HBM blowup per slab (OOMs 80^3);
                   # at B>=64 the pad waste is <=2x and the kernel's speedup
                   # dominates. Batches below also waste 1-B/128 of the
                   # kernel's own lane compute.


def lanes_eligible(B: int, W: int, dtype) -> bool:
    """Use the lanes kernels when the sequential diagonal work dominates:
    f32, at least one full 128-panel, and a batch big enough that lane
    packing beats XLA's small-batch loop and the batch-minor layout padding
    stays bounded."""
    import os

    if os.environ.get("CHOLESKY_TPU_LANES", "1") != "1":
        return False
    min_b = int(os.environ.get("CHOLESKY_TPU_LANES_MIN_B", LANES_MIN_B))
    if jnp.dtype(dtype) != jnp.float32 or W < BS or B < min_b:
        return False
    if _nondefault_matmul_precision():
        return False
    return jax.default_backend() in ("tpu", "axon")
