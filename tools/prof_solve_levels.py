"""Per-level timing of the frontal_solve chain on the live backend.

Times each level's forward step (gather + inv-apply + set + X-matvec +
scatter-add) and backward step in isolation, fori_loop-amortized, with the
REAL factors/plan at the flagship 50^3 scale — pinpoints which levels and
which primitive dominate the ~21 ms refined-solve inner iteration.

Usage: python tools/prof_solve_levels.py [dim levels]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import cholesky_tpu

cholesky_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

from cholesky_tpu import SparseCholesky
from cholesky_tpu.numeric import frontal
from cholesky_tpu.utils.laplacian import generate_problem

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 50
levels = int(sys.argv[2]) if len(sys.argv) > 2 else 8

n, r, c, v, o, cl, b = generate_problem((dim, dim, dim), levels)
solver = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
t0 = time.time()
solver.factorize()
print(f"factorize (incl compile): {time.time()-t0:.1f}s", flush=True)
fp = solver.fplan
factors = solver.panels
inv = solver._inv_pivots()
jax.block_until_ready(inv)

R = 100
bg0 = jnp.asarray(
    np.random.default_rng(0).standard_normal(n + 1).astype(np.float32))


@jax.jit
def _fwd_loop(bg, piv, bnd, iv, X):
    def body(i, bgc):
        bgc = bgc + jnp.float32(1e-30) * i      # defeat any invariant
        bp = bgc[piv]                            # hoisting / dedup
        y = jnp.einsum("bij,bj->bi", iv, bp,
                       preferred_element_type=bp.dtype)
        bgc = bgc.at[piv].set(y, mode="drop")
        if X.shape[1]:
            contrib = jnp.einsum("bij,bj->bi", X, y,
                                 preferred_element_type=y.dtype)
            bgc = bgc.at[bnd].add(-contrib)
        return bgc
    return jnp.sum(lax.fori_loop(0, R, body, bg))


@jax.jit
def _bwd_loop(bg, piv, bnd, iv, X):
    def body(i, bgc):
        bgc = bgc + jnp.float32(1e-30) * i
        rhs = bgc[piv]
        if X.shape[1]:
            z = bgc[bnd]
            rhs = rhs - jnp.einsum("bij,bi->bj", X, z,
                                   preferred_element_type=z.dtype)
        x = jnp.einsum("bji,bj->bi", iv, rhs,
                       preferred_element_type=rhs.dtype)
        return bgc.at[piv].set(x, mode="drop")
    return jnp.sum(lax.fori_loop(0, R, body, bg))


def timed(name, fn, *args):
    float(fn(bg0, *args))
    ts = []
    for k in range(3):
        bgk = bg0 + np.float32(k) * np.float32(1e-7)
        t0 = time.perf_counter()
        float(fn(bgk, *args))
        ts.append(time.perf_counter() - t0)
    us = min(ts) / R * 1e6
    print(f"{name:<46} {us:>9.1f} us  (call {min(ts)*1e3:.1f} ms)",
          flush=True)
    return us


tot_f = tot_b = 0.0
for lvl in range(fp.levels - 1, -1, -1):
    Wl, Fl = fp.W[lvl], fp.F[lvl]
    B = fp.front_rows[lvl].shape[0]
    piv = jnp.asarray(fp.front_rows[lvl][:, :Wl])
    bnd = jnp.asarray(fp.front_rows[lvl][:, Wl:])
    tot_f += timed(f"fwd  lvl {lvl} B={B:<4d} W={Wl:<5d} F={Fl}",
                   _fwd_loop, piv, bnd, inv[lvl], factors[lvl][:, Wl:, :])

for lvl in range(fp.levels):
    Wl, Fl = fp.W[lvl], fp.F[lvl]
    B = fp.front_rows[lvl].shape[0]
    piv = jnp.asarray(fp.front_rows[lvl][:, :Wl])
    bnd = jnp.asarray(fp.front_rows[lvl][:, Wl:])
    tot_b += timed(f"bwd  lvl {lvl} B={B:<4d} W={Wl:<5d} F={Fl}",
                   _bwd_loop, piv, bnd, inv[lvl], factors[lvl][:, Wl:, :])

print(f"sum fwd {tot_f/1e3:.2f} ms + bwd {tot_b/1e3:.2f} ms = "
      f"{(tot_f+tot_b)/1e3:.2f} ms", flush=True)

# contiguity diagnostics: can pivot gathers/scatters become slices?
for lvl in range(fp.levels):
    pr = fp.front_rows[lvl][:, :fp.W[lvl]].ravel()
    real = pr[pr < n]
    contig = bool(np.all(np.diff(real) == 1)) if real.size else True
    print(f"lvl {lvl}: pivot rows contiguous-ascending={contig} "
          f"min={real.min() if real.size else -1} "
          f"max={real.max() if real.size else -1} count={real.size}",
          flush=True)
