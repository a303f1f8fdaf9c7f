"""Pallas TPU kernels for the frontal engine's hot per-level stages.

The dominant non-matmul cost in the level loop is the sequential diagonal
work of the batched partial front factorization. XLA lowers batched
Cholesky to an unblocked column-at-a-time While loop over HBM-resident
arrays (~n sequential passes of full-array traffic); for the many
small/mid fronts of a deep elimination tree that is bandwidth-bound and
slow. The batch-in-lanes kernels below keep that work in VMEM with the
batch transposed into the 128-lane dimension.

A whole-front Pallas kernel (VMEM-resident blocked right-looking partial
factorization of each [F, W] slab, one grid step per front) was built,
measured per level class against XLA and the lanes path on the real chip
(tools/bench_front_kernels.py, table in docs/performance.md), and DELETED:
it lost at every eligible class — 6x at [64, 1008, 384], 17x at
[256, 512, 256] — because one-front-per-grid-step serializes what the
lanes layout executes 128 fronts wide per vector op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128                        # panel width (MXU native)


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


LANES_MIN_B = 32   # min batch: XLA lays the slab out batch-minor to feed the
                   # kernel's [F, W, B] transpose, padding B to 128 lanes —
                   # at B=8 that is a 16x HBM blowup per slab (OOMs 80^3).
                   # Batches below also waste 1-B/128 of the kernel's own
                   # lane compute.

# B-vs-W crossover, fit to the per-level-class shootout on the real chip
# (tools/bench_front_kernels.py; table in docs/performance.md): lanes wins
# 1.25x at [32, 1488, 512] and loses 2x at [16, 2160, 640] — sequential
# panel count grows with W while lane utilization grows with B, and the
# measured boundary is B >= W/16.
LANES_W_PER_B = 16

# padded-slab HBM guard: below 128 fronts the batch-minor layout pads the
# lane dimension to 128, multiplying the slab's HBM footprint 128/B x.
_LANES_PAD_BYTES = 2 * 1024 ** 3


def lanes_eligible(B: int, W: int, dtype, F: int = None) -> bool:
    """Use the lanes kernels when the sequential diagonal work dominates:
    f32, at least one full 128-panel, and a batch big enough that lane
    packing beats XLA's small-batch loop (B >= max(32, W/16), the measured
    crossover) and the batch-minor layout padding stays bounded."""
    import os

    if os.environ.get("CHOLESKY_TPU_LANES", "1") != "1":
        return False
    min_b = int(os.environ.get("CHOLESKY_TPU_LANES_MIN_B", LANES_MIN_B))
    if jnp.dtype(dtype) != jnp.float32 or W < BS or B < min_b:
        return False
    if B * LANES_W_PER_B < W:
        return False
    if F is not None and B < LANES_BT:
        padded = -(-B // LANES_BT) * LANES_BT * F * W * 4
        if padded > _LANES_PAD_BYTES:
            return False
    if _nondefault_matmul_precision():
        return False
    return jax.default_backend() in ("tpu", "axon")
