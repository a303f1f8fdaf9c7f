"""Measure the serialized size of the factor/solve programs (compile-request
proxy) and the total bytes of host-side index maps baked in as constants."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp

from cholesky_tpu.numeric import frontal
from cholesky_tpu.symbolic.plan import build_plan
from cholesky_tpu.utils.laplacian import generate_problem

shape = tuple(int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "80,80,80").split(","))
levels = int(sys.argv[2]) if len(sys.argv) > 2 else 10
n, r, c, v, o, cl, b = generate_problem(shape, levels)
plan = build_plan(o, cl)
fp = frontal.build_frontal_plan(plan, r, c)

maps_bytes = sum(a.nbytes for a in fp.front_rows)
maps_bytes += sum(a.nbytes for a in fp.inv_child if a is not None)
maps_bytes += sum(a.nbytes for a in fp.fwd_child if a is not None)
print(f"index maps total: {maps_bytes/2**20:.1f} MiB")

fronts_spec = tuple(
    jax.ShapeDtypeStruct((1 << l, fp.F[l], fp.W[l]), jnp.float32)
    for l in range(fp.levels))

def factor_cs(fs):
    out = frontal.frontal_factor(fp, fs, extadd="hybrid3")
    return out, sum(jnp.sum(p.astype(jnp.float32)) for p in out)

lowered = jax.jit(factor_cs).lower(fronts_spec)
txt = lowered.as_text()
print(f"factor StableHLO text: {len(txt)/2**20:.1f} MiB")
import re
consts = re.findall(r"dense<", txt)
print(f"dense constants: {len(consts)}")
# serialized (what goes over the wire is closer to the proto)
try:
    comp = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
    print(f"serialized HLO proto: {len(comp)/2**20:.1f} MiB")
except Exception as e:
    print("proto dump failed:", type(e).__name__, e)

bp = jax.ShapeDtypeStruct((n,), jnp.float32)
def solve_fn(fs, bb):
    return frontal.frontal_solve(fp, fs, bb)
low2 = jax.jit(solve_fn).lower(fronts_spec, bp)
print(f"solve StableHLO text: {len(low2.as_text())/2**20:.1f} MiB")
try:
    comp2 = low2.compiler_ir("hlo").as_serialized_hlo_module_proto()
    print(f"solve serialized proto: {len(comp2)/2**20:.1f} MiB")
except Exception as e:
    print("proto dump failed:", type(e).__name__, e)
