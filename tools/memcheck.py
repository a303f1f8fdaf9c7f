"""Compile the factor program for a given problem and print XLA's memory
analysis (no execution, no front upload — args are ShapeDtypeStructs)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

import cholesky_tpu; cholesky_tpu.setup_compilation_cache()

from cholesky_tpu.numeric import frontal
from cholesky_tpu.symbolic.plan import build_plan
from cholesky_tpu.utils.laplacian import generate_problem

shape = tuple(int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "80,80,80").split(","))
levels = int(sys.argv[2]) if len(sys.argv) > 2 else 10
extadd = os.environ.get("CHOLESKY_TPU_EXTADD", "hybrid3")
n, r, c, v, o, cl, b = generate_problem(shape, levels)
plan = build_plan(o, cl)
fp = frontal.build_frontal_plan(plan, r, c)
print(f"n={n} backend={jax.default_backend()}", flush=True)

fronts_spec = tuple(
    jax.ShapeDtypeStruct((1 << l, fp.F[l], fp.W[l]), jnp.float32)
    for l in range(fp.levels))

def factor_cs(fs):
    out = frontal.frontal_factor(fp, fs, extadd=extadd)
    return out, sum(jnp.sum(p.astype(jnp.float32)) for p in out)

donate = os.environ.get("MEMCHECK_DONATE") == "1"
jf = jax.jit(factor_cs, donate_argnums=0) if donate else jax.jit(factor_cs)
print("lowering...", flush=True)
low = jf.lower(fronts_spec)
print("compiling...", flush=True)
comp = low.compile()
ma = comp.memory_analysis()
print(ma, flush=True)
for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
             "output_size_in_bytes", "alias_size_in_bytes",
             "generated_code_size_in_bytes"):
    val = getattr(ma, attr, None)
    if val is not None:
        print(f"{attr}: {val/2**30:.2f} GiB", flush=True)
