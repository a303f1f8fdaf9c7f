#!/usr/bin/env python
"""Microbenchmark: double-float ELL matvec gather layouts.

The refinement loop's residual is one sparse matvec in double-float; its
cost is dominated by gathering x at the ELL column indices. Compares:
  stacked2  — ONE [n, K, 2] gather from a [n+1, 2] operand (current)
  two_flat  — two [n, K] gathers (hi, lo) from flat [n+1] operands
  transp    — ELL transposed [K, n]: K gathers of [n] each, unrolled
Prints min ms per full df residual over the 50^3 problem.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

import cholesky_tpu; cholesky_tpu.setup_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cholesky_tpu.numeric import refine
from cholesky_tpu.utils.laplacian import generate_problem
from cholesky_tpu.symbolic.plan import build_plan

shape, levels = (50, 50, 50), 8
n, r, c, v, o, cl, b = generate_problem(shape, levels)
plan = build_plan(o, cl)
off = r != c
rr = np.concatenate([r, c[off]])
cc = np.concatenate([c, r[off]])
vv = np.concatenate([v, v[off]])
pr, pc = plan.iperm[rr], plan.iperm[cc]
idx, a_hi, a_lo = refine.build_ell(n, pr, pc, vv)
K = idx.shape[1]
print(f"n={n} K={K}", flush=True)

x64 = np.random.default_rng(0).standard_normal(n)
x_hi, x_lo = refine.split_f64(x64)
xh = jnp.asarray(np.concatenate([x_hi, [0.0]]).astype(np.float32))
xl = jnp.asarray(np.concatenate([x_lo, [0.0]]).astype(np.float32))
idx_d = jnp.asarray(idx)
ah_d, al_d = jnp.asarray(a_hi), jnp.asarray(a_lo)
# transposed planes
idx_t = jnp.asarray(idx.T.copy())
ah_t, al_t = jnp.asarray(a_hi.T.copy()), jnp.asarray(a_lo.T.copy())

_two_sum, _two_prod = refine._two_sum, refine._two_prod


def fold(p, e_all):
    s = p[:, 0]
    cacc = e_all[:, 0]
    for k in range(1, p.shape[1]):
        s, se = _two_sum(s, p[:, k])
        cacc = cacc + (se + e_all[:, k])
    return s, cacc


@jax.jit
def mv_stacked2(xh, xl):
    yh, yl = refine.df_matvec(idx_d, ah_d, al_d, xh, xl)
    return jnp.sum(yh) + jnp.sum(yl)


@jax.jit
def mv_two_flat(xh, xl):
    xgh = xh[idx_d]
    xgl = xl[idx_d]
    p, pe = _two_prod(ah_d, xgh)
    cross = ah_d * xgl + al_d * xgh
    s, cacc = fold(p, pe + cross)
    return jnp.sum(s) + jnp.sum(cacc)


@jax.jit
def mv_transp(xh, xl):
    ps, es = [], []
    for k in range(K):
        xgh = xh[idx_t[k]]
        xgl = xl[idx_t[k]]
        p, pe = _two_prod(ah_t[k], xgh)
        cross = ah_t[k] * xgl + al_t[k] * xgh
        ps.append(p)
        es.append(pe + cross)
    s = ps[0]
    cacc = es[0]
    for k in range(1, K):
        s, se = _two_sum(s, ps[k])
        cacc = cacc + (se + es[k])
    return jnp.sum(s) + jnp.sum(cacc)


def timeit(f, *a, iters=8):
    float(f(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


floor = timeit(jax.jit(lambda x: jnp.sum(x)), jnp.ones((8, 8), jnp.float32))
print(f"floor {floor*1e3:.1f} ms", flush=True)
for name, f, args in [("stacked2", mv_stacked2, (xh, xl)),
                      ("two_flat", mv_two_flat, (xh, xl)),
                      ("transp", mv_transp, (xh, xl))]:
    t = timeit(f, *args) - floor
    print(f"{name}: {t*1e3:.2f} ms", flush=True)

# correctness cross-check
y1 = refine.df_matvec(idx_d, ah_d, al_d, xh, xl)
ref = np.zeros(n)
import scipy.sparse
A = scipy.sparse.csr_matrix((vv, (pr, pc)), shape=(n, n))
ref = A @ x64
got = np.asarray(y1[0], np.float64) + np.asarray(y1[1], np.float64)
print("max err stacked2:", np.max(np.abs(got - ref)) / np.max(np.abs(ref)),
      flush=True)
