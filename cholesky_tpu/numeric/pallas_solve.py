"""Frame-propagation triangular solve as per-level Pallas TPU kernels.

The refinement loop's inner solve is kernel-count-bound on this backend:
every dependent kernel in a compiled program costs ~140-250 us of chain
latency (tools/prof_scatter.py), so the XLA banded level chain
(frontal._solve_banded_core) pays ~70 kernels ~= 17 ms per solve at 50^3
while its arithmetic is microseconds. This module re-expresses the solve
as MULTIFRONTAL FRAME PROPAGATION — contributions hop parent<->child
through positional maps instead of scattering into a global vector — and
fuses each level's whole step into ONE Pallas kernel per direction:

  forward  (leaves -> root), per front at level l:
      u_in  = select(children u_out, inv_child)   [summed over the pair]
      y     = L_d^{-1} (b_band - u_in[:W])
      u_out = X y + u_in[W:]
  backward (root -> leaves), per front:
      z_bnd = select(parent [x | z_bnd], fwd_child)
      x     = L_d^{-T} (y - X^T z_bnd)

The selections have STATIC index vectors, but Mosaic's dynamic_gather
does not compile on this chip (tpu_compile_helper 500, measured) — so
each selection runs as a ONE-HOT MATMUL whose 0/1 matrix is generated
in-kernel from a broadcasted_iota compare (VPU) and contracted on the
MXU at HIGHEST precision (exact for 0/1 x f32: every output has exactly
one contributing product). The global vector appears only at entry
(per-level band slices of the padded rhs) and exit (band concatenation),
mirroring frontal._banded_maps' basis. The root level runs in plain XLA
(one front; its [W0, W0] inverse exceeds a comfortable VMEM block).

Numerics: identical operands and products as the inv_pivots path (the
same L_d^{-1} panels and X blocks, f32 HIGHEST-precision dots), so
refinement convergence matches frontal._solve_banded_core sweep for
sweep.

Role parity: the reference's solve is a rounding error next to its
factorization (mmat.rg:1364-1481); this keeps ours one too.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FRAME_CACHE = {}

# Scoped-VMEM ceiling for the level kernels. The default 16 MB limit
# rejects the small-B/large-W levels (their double-buffered X block alone
# is ~25 MB at 50^3 lvl1); this chip (v5e) accepts raised limits to ~60 MB
# (probed: 60 MB OK, 90 MB compile failure).
_VMEM_LIMIT = 56 * (1 << 20)

# interpret-mode switch for CPU tests (pl.pallas_call(interpret=True)
# runs the kernels in a reference interpreter on any backend)
_INTERPRET = False

_HI = lax.Precision.HIGHEST


def _round128(x: int) -> int:
    return max(((x + 127) // 128) * 128, 128)


def frame_maps(fp):
    """Host-side static structures for the frame-propagation solve.

    Per level l (0 = root): M[l] — padded width of the level-l forward
    u_out frames (>= bndK_l + 1 so the extend sentinel addresses a zero
    column); Mb[l] — padded width of the backward zfull frames
    (>= F[l] + 1); asm_idx[l] [B_l, F_{l-1}] int32 — for each level-l
    child front, where each parent-frame position sits in that child's
    u_out (sentinel bndK_l -> zero pad column); sel_idx[l] [B_l, bndK_l]
    int32 — for each child front, the parent-frame position of each of
    its boundary rows (sentinel F_{l-1} -> the parent's zero pad column).
    Cached by fp.key()."""
    key = fp.key()
    hit = _FRAME_CACHE.get(key)
    if hit is not None:
        return hit
    levels = fp.levels
    M = [0] * levels
    Mb = [0] * levels
    asm_idx: List[Optional[np.ndarray]] = [None] * levels
    sel_idx: List[Optional[np.ndarray]] = [None] * levels
    for lvl in range(levels):
        M[lvl] = _round128(fp.F[lvl] - fp.W[lvl] + 1)
        Mb[lvl] = _round128(fp.F[lvl] + 1)
    for lvl in range(1, levels):
        asm_idx[lvl] = fp.inv_child[lvl].astype(np.int32)   # [B, F_parent]
        sel_idx[lvl] = fp.fwd_child[lvl].astype(np.int32)   # [B, bndK]
    maps = (tuple(M), tuple(Mb), asm_idx, sel_idx)
    _FRAME_CACHE[key] = maps
    return maps


# cap one-hot temporaries (the [K, fc] one-hot + its index broadcast,
# ~2-3 live at once) under the raised _VMEM_LIMIT. Small caps fragment
# the selection into many serialized tiny MXU ops (measured: 128-column
# chunks cost ~10 ms/solve of issue overhead at 50^3); full-width chunks
# collapse each front's assembly to ~6 ops.
_OH_CHUNK_ELEMS = 1 << 20


def _onehot_select(vals2d, idx2d, out_len):
    """Rows of one-hot selection: out[r, f] = vals2d[r, idx2d[r, f]], any
    idx addressing vals2d's zero padding selects 0. vals2d [R, K], idx2d
    [R, >= round128(out_len)], out [R, out_len]. Implemented as a
    generated one-hot [K, Fc] per row contracted on the MXU,
    column-chunked to bound the VMEM temporary — exact for 0/1 x f32
    since each output column has exactly one contributing product.

    Mosaic on this chip cannot broadcast a [1, N] vector along sublanes
    ("Invalid input layout"), so the index row is spread to [K, Fc] as an
    MXU outer product ones[K,1] @ idx[1,Fc] at HIGHEST precision (exact
    for integer values < 2^24) and compared against an f32 iota."""
    R, K = vals2d.shape
    Fp = _round128(out_len)
    chunk = max(128, min(Fp,
                         (_OH_CHUNK_ELEMS // max(K, 1)) // 128 * 128))
    ones_col = jnp.ones((K, 1), jnp.float32)
    outs = []
    for r in range(R):
        row = vals2d[r:r + 1, :]                               # [1, K]
        cols = []
        for c0 in range(0, Fp, chunk):
            fc = min(chunk, Fp - c0)
            idxf = idx2d[r:r + 1, c0:c0 + fc].astype(jnp.float32)
            idxb = jnp.dot(ones_col, idxf,
                           preferred_element_type=jnp.float32,
                           precision=_HI)                      # [K, fc]
            # tpu.iota is integer-only; convert for the f32 compare
            kk = lax.broadcasted_iota(jnp.int32, (K, fc), 0).astype(
                jnp.float32)
            oh = (kk == idxb).astype(jnp.float32)              # [K, fc]
            cols.append(jnp.dot(row, oh,
                                preferred_element_type=jnp.float32,
                                precision=_HI))                # [1, fc]
        out_r = (jnp.concatenate(cols, axis=1) if len(cols) > 1
                 else cols[0])
        outs.append(out_r[:, :out_len])
    return jnp.concatenate(outs, axis=0) if R > 1 else outs[0]


def _onehot_select_sum2(vals2d, idx2d, out_len):
    """Summed two-row selection in ONE contraction:
    out[f] = vals2d[0, i0] + vals2d[1, i1] where idx2d's second row is
    PRE-OFFSET by K on the host (see _pad_idx_dev offset), so both
    children's one-hots live in a single [2K, Fc] matrix and the pair-sum
    falls out of the dot. ~6 MXU/VPU ops per front instead of ~6 per
    (row x 128-column chunk)."""
    R, K = vals2d.shape
    assert R == 2
    K2 = 2 * K
    Fp = _round128(out_len)
    chunk = max(128, min(Fp,
                         (_OH_CHUNK_ELEMS // max(K2, 1)) // 128 * 128))
    vcat = jnp.concatenate([vals2d[0:1, :], vals2d[1:2, :]], axis=1)
    ones_col = jnp.ones((K2, 1), jnp.float32)
    kk = None
    cols = []
    for c0 in range(0, Fp, chunk):
        fc = min(chunk, Fp - c0)
        if kk is None or kk.shape[1] != fc:
            kk = lax.broadcasted_iota(jnp.int32, (K2, fc), 0).astype(
                jnp.float32)
        oh = jnp.zeros((K2, fc), jnp.float32)
        for r in range(2):
            idxf = idx2d[r:r + 1, c0:c0 + fc].astype(jnp.float32)
            idxb = jnp.dot(ones_col, idxf,
                           preferred_element_type=jnp.float32,
                           precision=_HI)
            oh = oh + (kk == idxb).astype(jnp.float32)
        cols.append(jnp.dot(vcat, oh, preferred_element_type=jnp.float32,
                            precision=_HI))
    out = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    return out[:, :out_len]


def _fwd_leaf_kernel(W, Fb, Ml, inv_ref, x_ref, b_ref, y_ref, u_ref):
    y = jnp.dot(inv_ref[0], b_ref[0].reshape(W, 1),
                preferred_element_type=jnp.float32, precision=_HI)
    y_ref[0] = y.reshape(1, W)
    u = jnp.dot(x_ref[0], y, preferred_element_type=jnp.float32,
                precision=_HI)
    u_ref[0] = jnp.pad(u.reshape(1, Fb), ((0, 0), (0, Ml - Fb)))


def _fwd_mid_kernel(W, Fb, F, Ml, Mc, inv_ref, x_ref, b_ref, uc_ref,
                    ai_ref, y_ref, u_ref):
    """One interior front's whole forward step: assemble the two
    children's contributions (one-hot selection), pivot solve, boundary
    matvec, pass-through of deeper contributions."""
    u_in = _onehot_select_sum2(uc_ref[:, 0, :], ai_ref[:, 0, :], F)
    r = b_ref[0].reshape(1, W) - u_in[:, :W]
    y = jnp.dot(inv_ref[0], r.reshape(W, 1),
                preferred_element_type=jnp.float32, precision=_HI)
    y_ref[0] = y.reshape(1, W)
    if Fb:
        u = jnp.dot(x_ref[0], y, preferred_element_type=jnp.float32,
                    precision=_HI)
        u_out = u.reshape(1, Fb) + u_in[:, W:W + Fb]
        u_ref[0] = jnp.pad(u_out, ((0, 0), (0, Ml - Fb)))
    else:
        u_ref[0] = jnp.zeros((1, Ml), jnp.float32)


def _bwd_kernel(W, Fb, F, Mbp, Mbl, inv_ref, x_ref, y_ref, zp_ref,
                si_ref, z_ref):
    """One front's whole backward step: select this front's boundary
    solution values from the parent's zfull frame, subtract X^T z from
    the forward y, apply L_d^{-T}, emit this front's zfull = [x | z]."""
    rhs = y_ref[0].reshape(1, W)
    if Fb:
        zb = _onehot_select(zp_ref[0], si_ref[0], Fb)          # [1, Fb]
        # X^T z without materializing a transpose (contract dim 0 of X)
        xtz = lax.dot_general(x_ref[0], zb.reshape(Fb, 1),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_HI)
        rhs = rhs - xtz.reshape(1, W)
    x = lax.dot_general(inv_ref[0], rhs.reshape(W, 1),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_HI)                          # inv^T rhs
    if Fb:
        zfull = jnp.concatenate([x.reshape(1, W), zb], axis=1)
    else:
        zfull = x.reshape(1, W)
    z_ref[0] = jnp.pad(zfull, ((0, 0), (0, Mbl - F)))


def _fwd_level_call(fp, lvl, inv_l, X_l, band, u_child, M, asm_l):
    levels = fp.levels
    B = fp.front_rows[lvl].shape[0]
    W, F = fp.W[lvl], fp.F[lvl]
    Fb = F - W
    Ml = M[lvl]
    out_shape = [jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
                 jax.ShapeDtypeStruct((B, 1, Ml), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0)),
                 pl.BlockSpec((1, 1, Ml), lambda i: (i, 0, 0))]
    if lvl == levels - 1:
        kern = functools.partial(_fwd_leaf_kernel, W, Fb, Ml)
        in_specs = [pl.BlockSpec((1, W, W), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, Fb, W), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0))]
        args = (inv_l, X_l, band)
    else:
        Mc = M[lvl + 1]
        in_specs = [pl.BlockSpec((1, W, W), lambda i: (i, 0, 0))]
        args = [inv_l]
        if Fb:
            kern = functools.partial(_fwd_mid_kernel, W, Fb, F, Ml, Mc)
            in_specs.append(pl.BlockSpec((1, Fb, W), lambda i: (i, 0, 0)))
            args.append(X_l)
        else:
            def kern(inv_ref, b_ref, uc_ref, ai_ref, y_ref, u_ref):
                _fwd_mid_kernel(W, 0, F, Ml, Mc, inv_ref, None, b_ref,
                                uc_ref, ai_ref, y_ref, u_ref)
        in_specs += [pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0)),
                     pl.BlockSpec((2, 1, Mc), lambda i: (i, 0, 0)),
                     pl.BlockSpec((2, 1, _round128(F)),
                                  lambda i: (i, 0, 0))]
        args += [band, u_child, asm_l]
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT))(*args)


def _bwd_level_call(fp, lvl, inv_l, X_l, y_l, zfull_parent, Mb, sel_l):
    B = fp.front_rows[lvl].shape[0]
    W, F = fp.W[lvl], fp.F[lvl]
    Fb = F - W
    Mbp, Mbl = Mb[lvl - 1], Mb[lvl]
    in_specs = [pl.BlockSpec((1, W, W), lambda i: (i, 0, 0))]
    args = [inv_l]
    if Fb:
        kern = functools.partial(_bwd_kernel, W, Fb, F, Mbp, Mbl)
        in_specs.append(pl.BlockSpec((1, Fb, W), lambda i: (i, 0, 0)))
        args.append(X_l)
    else:
        def kern(inv_ref, y_ref, zp_ref, si_ref, z_ref):
            _bwd_kernel(W, 0, F, Mbp, Mbl, inv_ref, None, y_ref, zp_ref,
                        si_ref, z_ref)
    in_specs += [pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0)),
                 pl.BlockSpec((1, 1, Mbp), lambda i: (i // 2, 0, 0)),
                 pl.BlockSpec((1, 1, _round128(max(Fb, 1))),
                              lambda i: (i, 0, 0))]
    args += [y_l, zfull_parent, sel_l]
    return pl.pallas_call(
        kern, grid=(B,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Mbl), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, Mbl), jnp.float32),
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT))(*args)


def _pad_idx_dev(a, width, sentinel, pair_offset=0):
    """[B, K] int32 host idx -> [B, 1, width] device array, padded with
    the map's sentinel (which addresses a zero column of its operand).
    With pair_offset, odd rows (the second child of each front pair) are
    shifted by it so _onehot_select_sum2 can treat the stacked children
    as one 2K-wide operand."""
    B, K = a.shape
    out = np.full((B, 1, width), sentinel, dtype=np.int32)
    out[:, 0, :K] = a
    if pair_offset:
        out[1::2] += pair_offset
    return jnp.asarray(out)


def solve_frames(fp, factors, inv_pivots, g):
    """Drop-in for frontal._solve_banded_core: rhs `g` is the padded-basis
    vector [n_pad + 1] (sentinel slot 0), returns x in the same basis.
    Requires f32 panels and the explicit pivot inverses."""
    from cholesky_tpu.numeric import frontal

    levels = fp.levels
    n_pad, offs, _, _, _ = frontal._banded_maps(fp)
    M, Mb, asm_idx, sel_idx = frame_maps(fp)
    asm_dev = [None] * levels
    sel_dev = [None] * levels
    for lvl in range(1, levels):
        # asm_idx[lvl] maps level-lvl children to parent (lvl-1) frame
        # positions; its sentinel (bndK_lvl) addresses the child u_out's
        # zero padding. sel_idx[lvl]'s sentinel (F_{lvl-1}) addresses the
        # parent zfull's zero padding.
        asm_dev[lvl] = _pad_idx_dev(asm_idx[lvl],
                                    _round128(fp.F[lvl - 1]),
                                    fp.F[lvl] - fp.W[lvl],
                                    pair_offset=M[lvl])
        Fb = fp.F[lvl] - fp.W[lvl]
        sel_dev[lvl] = _pad_idx_dev(
            sel_idx[lvl] if Fb else np.zeros((asm_idx[lvl].shape[0], 0),
                                             np.int32),
            _round128(max(Fb, 1)), fp.F[lvl - 1])

    bands = []
    for lvl in range(levels):
        B, W = fp.front_rows[lvl].shape[0], fp.W[lvl]
        bands.append(lax.slice(g, (offs[lvl],),
                               (offs[lvl] + B * W,)).reshape(B, 1, W))

    # ---- forward: leaves -> root ----
    ys = [None] * levels
    u = None
    for lvl in range(levels - 1, 0, -1):
        W = fp.W[lvl]
        X_l = factors[lvl][:, W:, :]
        ys[lvl], u = _fwd_level_call(
            fp, lvl, inv_pivots[lvl], X_l, bands[lvl], u, M,
            asm_dev[lvl + 1] if lvl + 1 < levels else None)
    # root in XLA: one front; its inverse exceeds a comfortable VMEM block
    W0, F0 = fp.W[0], fp.F[0]
    if levels > 1:
        uc = u[:, 0, :]                                   # [2, M1]
        ai = jnp.asarray(asm_idx[1])                      # [2, F0]
        u_in0 = jnp.take_along_axis(uc, ai, axis=1).sum(axis=0)  # [F0]
        r0 = bands[0][:, 0, :] - u_in0[None, :W0]
    else:
        r0 = bands[0][:, 0, :]
    y0 = jnp.einsum("bij,bj->bi", inv_pivots[0], r0,
                    preferred_element_type=jnp.float32)
    ys[0] = y0.reshape(1, 1, W0)

    # ---- backward: root -> leaves ----
    x0 = jnp.einsum("bji,bj->bi", inv_pivots[0], y0,
                    preferred_element_type=jnp.float32)
    zfull = jnp.pad(x0, ((0, 0), (0, Mb[0] - W0))).reshape(1, 1, Mb[0])
    xs = [x0.reshape(-1)]
    for lvl in range(1, levels):
        W = fp.W[lvl]
        X_l = factors[lvl][:, W:, :]
        zfull = _bwd_level_call(fp, lvl, inv_pivots[lvl], X_l, ys[lvl],
                                zfull, Mb, sel_dev[lvl])
        xs.append(zfull[:, 0, :W].reshape(-1))
    # bands are laid out leaves-first in the padded basis
    return jnp.concatenate(list(reversed(xs)) + [jnp.zeros(1, g.dtype)])


def wanted(fp, factors) -> bool:
    """usable() plus the CHOLESKY_TPU_FRAMES_SOLVE=0/1 override — the
    production routing predicate for the refinement loop's inner solve."""
    import os

    flag = os.environ.get("CHOLESKY_TPU_FRAMES_SOLVE")
    if flag == "0":
        return False
    if fp.key() in _RUNTIME_FAILED:
        return False
    if flag == "1":
        return True
    return usable(fp, factors)


def usable(fp, factors) -> bool:
    """Pallas frame solve preconditions: a TPU backend (or interpret
    mode), f32 panels, >= 2 levels, and per-front blocks that fit VMEM
    comfortably."""
    if not _INTERPRET:
        try:
            plat = jax.devices()[0].platform
        except Exception:  # noqa: BLE001
            return False
        if plat not in ("tpu", "axon"):
            return False
    if fp.levels < 2:
        return False
    try:
        if any(np.dtype(f.dtype) != np.float32 for f in factors):
            return False
    except Exception:  # noqa: BLE001
        return False
    M, Mb, _, _ = frame_maps(fp)
    for lvl in range(1, fp.levels):
        W, F = fp.W[lvl], fp.F[lvl]
        Fb = F - W
        # double-buffered per-front blocks + the chunked one-hot temps.
        # Mosaic's real stack allocation runs well past this operand
        # estimate (measured 103.8 MB scoped demand at B=2, W=1256,
        # F=2504 where the estimate said ~41 MB — the in-kernel one-hot
        # matmul temps and sublane padding are not operand-shaped), so
        # demand 2.5x headroom; a level past this routes the whole solve
        # to the XLA banded chain, and refine() additionally falls back
        # at runtime if Mosaic still refuses (_RUNTIME_FAILED below).
        per_front = (W * W + Fb * W + M[lvl] + Mb[lvl] + 2 * W
                     + _round128(F) + Mb[lvl - 1]) * 4
        if 2.5 * (2 * per_front + 8 * _OH_CHUNK_ELEMS) > \
                _VMEM_LIMIT - (4 << 20):
            return False
    return True


# FrontalPlan keys whose frames program failed at run/compile time (e.g. a
# Mosaic scoped-VMEM overflow the usable() estimate missed): refine()
# records them here after falling back to the banded chain so later solves
# skip the doomed compile.
_RUNTIME_FAILED: set = set()
