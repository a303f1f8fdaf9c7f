"""Per-level timing of the frame-propagation solve kernels on the live
backend: each level's forward/backward pallas_call in isolation,
fori_loop-amortized, with the real factors/plan — pinpoints where the
frames solve's milliseconds go (the per-level twin of
tools/prof_solve_levels.py for the banded chain).

Usage: python tools/prof_frames.py [dim levels]
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
from cholesky_tpu.numeric import frontal, pallas_solve
from cholesky_tpu.utils.laplacian import generate_problem

dim = int(sys.argv[1]) if len(sys.argv) > 1 else 50
levels = int(sys.argv[2]) if len(sys.argv) > 2 else 8

n, r, c, v, o, cl, b = generate_problem((dim, dim, dim), levels)
s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32,
                            precision="default")
t0 = time.time()
s.factorize()
print(f"factorize {time.time()-t0:.1f}s", flush=True)
fp = s.fplan
factors = s.panels
inv = s._inv_pivots()
maps = pallas_solve.frame_maps(fp)

n_pad, offs, inv_map, pad_of, _ = frontal._banded_maps(fp)
bp = np.asarray(b[s.plan.perm], np.float32)
b_ext = np.concatenate([bp, [0.0]]).astype(np.float32)
g = jnp.asarray(np.concatenate([b_ext[inv_map], [0.0]]).astype(np.float32))

R = 50


def timed(name, fn, *args):
    # ALL device operands ride as jit arguments — closures bake them into
    # the HLO as constants and blow the tunnel compile request (HTTP 413)
    jf = jax.jit(lambda a0, *rest: lax.fori_loop(
        0, R, lambda i, c: c + jnp.sum(jax.tree.leaves(
            fn(a0 + jnp.float32(1e-30) * i, *rest))[0]), jnp.float32(0)))
    t0 = time.time()
    float(jf(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jf(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:<26} {min(ts)/R*1e3:8.3f} ms  (compile {comp:.0f}s)",
          flush=True)


bands = []
for lvl in range(levels):
    B, W = fp.front_rows[lvl].shape[0], fp.W[lvl]
    bands.append(lax.slice(g, (offs[lvl],),
                           (offs[lvl] + B * W,)).reshape(B, W, 1))

# forward levels, leaves -> root (u chained realistically)
us = {}
for lvl in range(levels - 1, 0, -1):
    W = fp.W[lvl]
    X_l = factors[lvl][:, W:, :]
    inv_l = inv[lvl]
    band = bands[lvl]
    uc = us.get(lvl + 1)

    if uc is None:
        def fwd(band_, inv_, X_, lvl=lvl):
            return pallas_solve._fwd_level_call(fp, maps, lvl, inv_, X_,
                                                band_, None)

        timed(f"fwd lvl {lvl} (B={1 << lvl})", fwd, band, inv_l, X_l)
        ys_l, u_l = jax.jit(fwd)(band, inv_l, X_l)
    else:
        def fwd(band_, inv_, X_, uc_, lvl=lvl):
            return pallas_solve._fwd_level_call(fp, maps, lvl, inv_, X_,
                                                band_, uc_)

        timed(f"fwd lvl {lvl} (B={1 << lvl})", fwd, band, inv_l, X_l, uc)
        ys_l, u_l = jax.jit(fwd)(band, inv_l, X_l, uc)
    us[lvl] = u_l

# backward levels, root -> leaves
zf = jnp.zeros((1, maps.Mz[0], 1), jnp.float32)
zfs = {0: zf}
ys_cache = {}
for lvl in range(levels - 1, 0, -1):
    W = fp.W[lvl]

    def fwd_y(band_, inv_, X_, uc_, lvl=lvl):
        return pallas_solve._fwd_level_call(fp, maps, lvl, inv_, X_,
                                            band_, uc_)[0]

    ys_cache[lvl] = jax.jit(fwd_y)(bands[lvl], inv[lvl],
                                   factors[lvl][:, W:, :],
                                   us.get(lvl + 1))
for lvl in range(1, levels):
    W = fp.W[lvl]
    X_l = factors[lvl][:, W:, :]
    zp = zfs[lvl - 1]

    def bwd(y_, inv_, X_, zp_, lvl=lvl):
        return pallas_solve._bwd_level_call(fp, maps, lvl, inv_, X_,
                                            y_, zp_)

    timed(f"bwd lvl {lvl} (B={1 << lvl})", bwd, ys_cache[lvl], inv[lvl],
          X_l, zp)
    zfs[lvl] = jax.jit(bwd)(ys_cache[lvl], inv[lvl], X_l, zp)

# whole solves for reference (factors/inv as args)
timed("solve_frames (whole)",
      lambda g_, facs, iv: pallas_solve.solve_frames(fp, facs, iv, g_),
      g, tuple(factors), tuple(inv))
timed("banded chain (whole)",
      lambda g_, facs, iv: frontal._solve_banded_core(fp, facs, iv, g_),
      g, tuple(factors), tuple(inv))
print("DONE", flush=True)
