"""Per-level-class kernel shootout: Pallas front_factor_small vs lanes
(factor_slab_lanes) vs XLA blocked path, on the real chip (VERDICT r1 #5).

For each (B, F, W) level class of the 50^3 L8 tree (plus a deep-tree leaf
class), time the batched partial front factorization through each eligible
kernel. Decides whether front_factor_small earns its keep.

Run: python tools/bench_front_kernels.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import random

import cholesky_tpu; cholesky_tpu.setup_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cholesky_tpu.numeric import frontal
from cholesky_tpu.numeric import pallas_kernels as pk

# level classes (B, F, W): 50^3 L8 plan's levels + a 64^3-style leaf class
CLASSES = [
    (128, 1440, 864),      # 50^3 leaf level (lanes measured 9.2 ms)
    (64, 1008, 384),
    (32, 1488, 512),
    (16, 2160, 640),
    (8, 2512, 768),
    (4, 3136, 1024),
    (2, 3760, 1280),
    (1, 2504, 2504),       # root: pivot only
    (256, 512, 256),       # deep-tree small-leaf class
    (512, 256, 128),
]


def timeit(f, iters=5):
    float(f())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


floor = timeit(lambda: jnp.sum(jnp.ones((8, 8))).block_until_ready() * 0 + 1
               if False else jax.jit(lambda x: jnp.sum(x))(
                   jnp.ones((8, 8), jnp.float32)))
print(f"# rpc floor {floor*1e3:.1f} ms", flush=True)

k = random.PRNGKey(0)
print(f"{'B':>4} {'F':>5} {'W':>5} {'xla_ms':>8} {'lanes_ms':>9} "
      f"{'pallas_ms':>10} {'winner':>8}", flush=True)

for (B, F, W) in CLASSES:
    # SPD pivot slab: A = G G^T + F I on the pivot block, random boundary
    g = random.normal(k, (B, W, W), jnp.float32) / np.sqrt(W)
    piv = jnp.einsum("bik,bjk->bij", g, g) + F * jnp.eye(W, dtype=jnp.float32)
    bound = random.normal(k, (B, F - W, W), jnp.float32)
    slab = jnp.concatenate([piv, bound], axis=1)        # [B, F, W]
    jax.block_until_ready(slab)

    def xla_path(s):
        # s passed as an ARGUMENT — closing over the slab would bake a
        # multi-hundred-MB constant into the program (minutes-long compile)
        Ld = frontal._blocked_cholesky(s[:, :W, :])
        if F > W:
            X = frontal._tri_solve(Ld, s[:, W:, :], left_side=False,
                                   lower=True, transpose_a=True)
            return jnp.sum(X) + jnp.sum(Ld)
        return jnp.sum(Ld)

    xf = jax.jit(xla_path)
    t_xla = (timeit(lambda: xf(slab)) - floor) * 1e3

    t_lanes = float("nan")
    if W >= pk.BS:
        fn = jax.jit(lambda s: jnp.sum(pk.factor_slab_lanes(s, W)))
        t_lanes = (timeit(lambda: fn(slab)) - floor) * 1e3

    t_pallas = float("nan")
    if pk.pallas_eligible(F, W, jnp.float32):
        fn = jax.jit(lambda s: jnp.sum(pk.front_factor_small(s, F, W)))
        t_pallas = (timeit(lambda: fn(slab)) - floor) * 1e3

    opts = {"xla": t_xla, "lanes": t_lanes, "pallas": t_pallas}
    winner = min((v, n) for n, v in opts.items() if v == v)[1]
    print(f"{B:>4} {F:>5} {W:>5} {t_xla:>8.2f} {t_lanes:>9.2f} "
          f"{t_pallas:>10.2f} {winner:>8}", flush=True)
