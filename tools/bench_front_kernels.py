"""Per-level-class kernel shootout: lanes (factor_slab_lanes) vs the XLA
blocked path, on the real chip.

For each (B, F, W) level class of the 50^3 L8 tree (plus deep-tree leaf
classes), time the batched partial front factorization through each
eligible kernel. The measured table lives in docs/performance.md and sets
lanes_eligible's routing rule (B >= max(32, W/16)).

This tool originally also measured the whole-front Pallas kernel
front_factor_small (VERDICT r1 #5); it lost at every eligible class
(6-17x) and was deleted — the table in docs/performance.md records its
final numbers.

Methodology (tunnel-proof): each path runs R iterations inside ONE
lax.fori_loop per jit call, each iteration on a freshly perturbed slab
(i-dependent + carry-chained, so LICM can't hoist and nothing is
algebraically factorable), timed by scalar readback. Device time per call
is then hundreds of ms, dwarfing the tunnel RPC floor's +-10 ms jitter —
a handful of unrolled ops measured NEGATIVE times here before. The
refresh's own cost (one slab read+write per iteration) is measured by a
matching sum-only loop and subtracted from every path.

Run: python tools/bench_front_kernels.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

import cholesky_tpu; cholesky_tpu.setup_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cholesky_tpu.numeric import frontal
from cholesky_tpu.numeric import pallas_kernels as pk

# level classes (B, F, W): 50^3 L8 plan's levels + deep-tree leaf classes
CLASSES = [
    (128, 1440, 864),      # 50^3 leaf level
    (64, 1008, 384),
    (32, 1488, 512),
    (16, 2160, 640),
    (8, 2512, 768),
    (4, 3136, 1024),
    (2, 3760, 1280),
    (1, 2504, 2504),       # root: pivot only
    (256, 512, 256),       # deep-tree small-leaf classes
    (512, 256, 128),
]


def timeit(f, *a, iters=4):
    float(f(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


floor = timeit(jax.jit(lambda x: jnp.sum(x)), jnp.ones((8, 8), jnp.float32))
print(f"# rpc floor {floor*1e3:.1f} ms", flush=True)

k = random.PRNGKey(0)
print(f"{'B':>4} {'F':>5} {'W':>5} {'R':>4} {'xla_ms':>8} {'lanes_ms':>9} "
      f"{'winner':>8}", flush=True)

results = []
for (B, F, W) in CLASSES:
    # SPD pivot slab: A = G G^T + F I on the pivot block, random boundary
    g = random.normal(k, (B, W, W), jnp.float32) / np.sqrt(W)
    piv = jnp.einsum("bik,bjk->bij", g, g) + F * jnp.eye(W, dtype=jnp.float32)
    bound = random.normal(k, (B, F - W, W), jnp.float32) * 1e-3
    slab = jnp.concatenate([piv, bound], axis=1)        # [B, F, W]
    jax.block_until_ready(slab)

    # iteration count: aim for ~2 s of device work per timed call, assuming
    # a (pessimistic) 100 GB/s effective on 4 slab-sized passes
    slab_bytes = B * F * W * 4
    R = int(min(400, max(30, 2.0 / (4 * slab_bytes / 100e9))))

    def loop(fn_one):
        def run(sl):                # slab as ARGUMENT, never a jit constant
            def body(i, c):
                s = sl + (1e-7 * i + 1e-30 * c)      # fresh operand
                return c + 1e-9 * fn_one(s)
            return lax.fori_loop(0, R, body, jnp.float32(0))
        return jax.jit(run)

    # refresh-only baseline: the perturbation's own slab read+write + sum
    t_base = (timeit(loop(jnp.sum), slab) - floor) / R

    def xla_one(s):
        Ld = frontal._blocked_cholesky(s[:, :W, :])
        if F > W:
            X = frontal._tri_solve(Ld, s[:, W:, :], left_side=False,
                                   lower=True, transpose_a=True)
            return jnp.sum(X) + jnp.sum(Ld)
        return jnp.sum(Ld)

    t_xla = (timeit(loop(xla_one), slab) - floor) / R - t_base

    t_lanes = float("nan")
    if W >= pk.BS:
        t_lanes = (timeit(loop(lambda s: jnp.sum(
            pk.factor_slab_lanes(s, W))), slab) - floor) / R - t_base

    opts = {"xla": t_xla * 1e3, "lanes": t_lanes * 1e3}
    winner = min((v, n) for n, v in opts.items() if v == v)[1]
    results.append({"B": B, "F": F, "W": W, "R": R, "base_ms":
                    round(t_base * 1e3, 3),
                    **{n: (None if v != v else round(v, 3))
                       for n, v in opts.items()}, "winner": winner,
                    "routed": "lanes" if pk.lanes_eligible(
                        B, W, jnp.float32, F) else "xla"})
    print(f"{B:>4} {F:>5} {W:>5} {R:>4} {opts['xla']:>8.2f} "
          f"{opts['lanes']:>9.2f} {winner:>8}", flush=True)

import json
print(json.dumps(results))
