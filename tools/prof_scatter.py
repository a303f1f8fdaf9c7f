"""Microbenchmark the solve chain's constituent ops on the live backend.

The refined solve at 50^3 is ~21 ms per frontal_solve against ~0.5 MB of
vector data — latency, not bandwidth. This times each primitive the level
steps are made of (gather, scatter-set, scatter-add, batched-matvec einsum)
inside fori_loop chains so per-call dispatch is amortized, to find where
the milliseconds actually go.

Usage: python tools/prof_scatter.py [n] [B] [W] [Fb]
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 125000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
W = int(sys.argv[3]) if len(sys.argv) > 3 else 32
Fb = int(sys.argv[4]) if len(sys.argv) > 4 else 200
R = 200

rng = np.random.default_rng(0)
piv_idx = jnp.asarray(
    rng.choice(n, size=(B, W), replace=False).astype(np.int32))
piv_sorted = jnp.asarray(np.sort(np.asarray(piv_idx).ravel())
                         .reshape(B, W).astype(np.int32))
bnd_idx = jnp.asarray(rng.integers(0, n, size=(B, Fb)).astype(np.int32))
bg0 = jnp.asarray(rng.standard_normal(n + 1).astype(np.float32))
M = jnp.asarray(rng.standard_normal((B, Fb, W)).astype(np.float32))
Minv = jnp.asarray(rng.standard_normal((B, W, W)).astype(np.float32))


def timed(name, body):
    fn = jax.jit(lambda bg: lax.fori_loop(
        0, R, lambda i, bgc: body(bgc, i), bg))
    bg = bg0
    jax.block_until_ready(fn(bg))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(bg))
        ts.append(time.perf_counter() - t0)
    print(f"{name:<42} {min(ts)/R*1e6:>9.1f} us/op", flush=True)


def chain(bg, delta):
    # keep iterations data-dependent so the loop body can't be hoisted
    return bg + jnp.float32(1e-30) * delta


timed("gather [B,W]",
      lambda bg, i: chain(bg, jnp.sum(bg[piv_idx])))
timed("gather [B,Fb]",
      lambda bg, i: chain(bg, jnp.sum(bg[bnd_idx])))
timed("scatter-set [B,W]",
      lambda bg, i: bg.at[piv_idx].set(bg[piv_idx] + 1e-30, mode="drop"))
timed("scatter-set [B,W] unique",
      lambda bg, i: bg.at[piv_idx].set(bg[piv_idx] + 1e-30, mode="drop",
                                       unique_indices=True))
timed("scatter-set [B,W] unique+sorted",
      lambda bg, i: bg.at[piv_sorted].set(bg[piv_sorted] + 1e-30,
                                          mode="drop", unique_indices=True,
                                          indices_are_sorted=True))
timed("scatter-add [B,Fb]",
      lambda bg, i: bg.at[bnd_idx].add(bg[bnd_idx] * 1e-30, mode="drop"))
timed("einsum [B,Fb,W]x[B,W]",
      lambda bg, i: chain(bg, jnp.sum(jnp.einsum(
          "bfw,bw->bf", M, bg[piv_idx],
          preferred_element_type=jnp.float32))))
timed("einsum [B,W,W]x[B,W] (inv apply)",
      lambda bg, i: chain(bg, jnp.sum(jnp.einsum(
          "bij,bj->bi", Minv, bg[piv_idx],
          preferred_element_type=jnp.float32))))
timed("full fwd step (gather+inv+set+X+add)",
      lambda bg, i: (lambda y: bg.at[piv_idx].set(y, mode="drop")
                     .at[bnd_idx].add(-jnp.einsum(
                         "bfw,bw->bf", M, y,
                         preferred_element_type=jnp.float32), mode="drop"))(
          jnp.einsum("bij,bj->bi", Minv, bg[piv_idx],
                     preferred_element_type=jnp.float32)))

# --- the level-chain floor: what does ONE dependent kernel cost? ---
timed("dependent trivial op (bg*c+1)",
      lambda bg, i: bg * jnp.float32(1.0000001) + jnp.float32(1e-30))
timed("big 1-D gather [n] (entry/exit relabel)",
      lambda bg, i: chain(bg, jnp.sum(bg[jnp.flip(jnp.arange(n + 1))])))
big_g = jnp.asarray(rng.permutation(n + 1).astype(np.int32))
timed("big 1-D gather [n] random",
      lambda bg, i: chain(bg, jnp.sum(bg[big_g])))
timed("dyn_update_slice [B*W]",
      lambda bg, i: lax.dynamic_update_slice(
          bg, bg[: B * W] * jnp.float32(1.0000001), (jnp.int32(0),)))
timed("static slice+reshape+einsum inv (banded fwd)",
      lambda bg, i: chain(bg, jnp.sum(jnp.einsum(
          "bij,bj->bi", Minv, lax.slice(bg, (0,), (B * W,)).reshape(B, W),
          preferred_element_type=jnp.float32))))
# VPU form of the batched matvec: elementwise mul + reduce instead of
# dot_general — does XLA's batched dot serialize over B on this backend?
timed("vpu-form inv apply (mul+sum)",
      lambda bg, i: chain(bg, jnp.sum(
          jnp.sum(Minv * bg[piv_idx][:, None, :], axis=-1))))
timed("vpu-form X apply [B,Fb,W]",
      lambda bg, i: chain(bg, jnp.sum(
          jnp.sum(M * bg[piv_idx][:, None, :], axis=-1))))
# batch-2 and batch-1 einsum: is cost ~ per-batch-element?
M1 = Minv[:2]
p1 = piv_idx[:2]
timed("einsum inv apply B=2",
      lambda bg, i: chain(bg, jnp.sum(jnp.einsum(
          "bij,bj->bi", M1, bg[p1], preferred_element_type=jnp.float32))))
