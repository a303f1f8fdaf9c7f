"""Dump the largest buffers of one streamed level program.

Compiles level MEMCHECK_LVL (env) of the given problem like
memcheck_stream.py, then generically decodes the serialized buffer
assignment proto (no schema needed): walks the protobuf wire format,
collects every submessage that contains a large varint (candidate buffer
size) and prints the strings (instruction/HLO names) found in the same
submessage.

Usage: MEMCHECK_LVL=5 python tools/buffer_dump.py [shape] [levels] [minMB]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import cholesky_tpu  # noqa: E402

cholesky_tpu.setup_compilation_cache()

from cholesky_tpu.numeric import frontal  # noqa: E402
from cholesky_tpu.symbolic.plan import build_plan  # noqa: E402
from cholesky_tpu.utils.laplacian import generate_problem  # noqa: E402


def walk(buf, path, out, min_size):
    """Generic protobuf wire walk: yields (path, varints, strings)."""
    i, n = 0, len(buf)
    ints, strs, subs = [], [], []
    while i < n:
        # varint key
        key = 0
        shift = 0
        while True:
            if i >= n:
                return None
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = key >> 3, key & 7
        if wt == 0:            # varint
            v = 0
            shift = 0
            while True:
                if i >= n:
                    return None
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            ints.append((field, v))
        elif wt == 2:          # length-delimited
            ln = 0
            shift = 0
            while True:
                if i >= n:
                    return None
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            if i + ln > n:
                return None
            payload = buf[i:i + ln]
            i += ln
            # try utf-8 string
            try:
                t = payload.decode("utf-8")
                if t.isprintable() and len(t) > 2:
                    strs.append((field, t))
                    continue
            except UnicodeDecodeError:
                pass
            subs.append((field, payload))
        elif wt == 5:
            i += 4
        elif wt == 1:
            i += 8
        else:
            return None
    for field, payload in subs:
        r = walk(payload, path + [field], out, min_size)
        if r is None:
            # not a message; ignore
            continue
    if any(v >= min_size for _, v in ints):
        out.append((path, ints, strs))
    return True


def main():
    shape = tuple(int(x) for x in (
        sys.argv[1] if len(sys.argv) > 1 else "100,100,100").split(","))
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    min_mb = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    lvl_want = int(os.environ["MEMCHECK_LVL"])
    extadd = os.environ.get("CHOLESKY_TPU_EXTADD", "hybrid3")

    n, r, c, v, o, cl, b = generate_problem(shape, levels)
    plan = build_plan(o, cl)
    fp = frontal.build_frontal_plan(plan, r, c)
    total = sum((1 << l) * fp.F[l] * fp.W[l] * 4 for l in range(fp.levels))
    gm_cap = frontal._effective_gathermm_cap(total)
    # mirror production (frontal_factor_streamed): per-level bf16 updates,
    # compressed factor store past the f32 ceiling
    store_dtype = (jnp.bfloat16 if total > frontal._F32_STORE_BYTES
                   or os.environ.get("CHOLESKY_TPU_UPLOAD_STREAM") == "1"
                   else None)

    utag = "none"
    u_shape = None
    for lvl in range(fp.levels - 1, -1, -1):
        Wl, Fl = fp.W[lvl], fp.F[lvl]
        B = 1 << lvl
        update_dtype = frontal._update_dtype_for(jnp.float32,
                                                 frontal._u_bytes(fp, lvl))
        if lvl == lvl_want:
            fn = frontal._level_step_jit(fp, lvl, utag, extadd, gm_cap,
                                         update_dtype, None, True,
                                         store_dtype=store_dtype)
            piv_spec = jax.ShapeDtypeStruct((B, Fl, Wl), jnp.float32)
            args = (piv_spec,) if utag == "none" else (
                piv_spec, jax.ShapeDtypeStruct(*u_shape))
            comp = fn.lower(*args).compile()
            ma = comp.memory_analysis()
            print(f"lvl{lvl}: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
                  f"peak={getattr(ma, 'peak_memory_in_bytes', 0)/2**30:.2f}",
                  flush=True)
            blob = ma.serialized_buffer_assignment_proto
            print(f"proto bytes: {len(blob)}", flush=True)
            out = []
            walk(blob, [], out, int(min_mb * 2**20))
            seen = set()
            rows = []
            for path, ints, strs in out:
                big = max(v for _, v in ints if v >= min_mb * 2**20)
                label = "; ".join(t for _, t in strs[:3])
                k = (big, label)
                if k in seen:
                    continue
                seen.add(k)
                rows.append((big, label, path))
            rows.sort(reverse=True)
            for big, label, path in rows[:40]:
                print(f"{big/2**20:9.1f} MB  path={path}  {label[:140]}",
                      flush=True)
            return
        if lvl == 0:
            break
        K = Fl - Wl
        if utag == "none" and Fl > Wl:
            utag, u_shape = "xxt", ((B, K, Wl), update_dtype)
        else:
            utag, u_shape = "arr", ((B, K, K) if K else (B, 0, 0),
                                    update_dtype)


if __name__ == "__main__":
    main()
