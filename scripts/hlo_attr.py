"""Attribute named HLO ops (from a prof_step.py profile) to JAX source
lines via compiled-HLO metadata, and print the largest-footprint ops.

    python scripts/hlo_attr.py [--quick] [--ops fusion.876,fusion.17]
    python scripts/hlo_attr.py --bytes-top 30   # biggest ops by operand+out bytes
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def buf_bytes(shape_str):
    """Rough byte count from an HLO shape string like
    f32[32,180,320,203]{...} or a tuple thereof."""
    total = 0
    for m in re.finditer(r"(f32|bf16|s32|u32|f16|s16|u16|pred|s8|u8)"
                         r"\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                      "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1}[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--ops", default="")
    ap.add_argument("--bytes-top", type=int, default=0)
    ap.add_argument("--dump", default="")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    model, args, params, batch, losscfg, (ph, pw), info = \
        bench.build_bench_setup(quick=opts.quick, fast_grad=True,
                                no_remat=True)
    model.gather_dtype = jnp.bfloat16
    from videoloop3d_tpu.render.compact import slot_bound
    S = slot_bound(model.geom, model.tile_map_static, model.tile_map_dyn,
                   np.asarray(batch["extrin"]), np.asarray(batch["intrin"]),
                   ph, pw)
    if S < model.geom.n_planes:
        model.compact_slots = S
    from videoloop3d_tpu.train.common import set_sparse_fastpath_bounds
    args.compact_tiles = True
    args.blocked_lookup = True
    set_sparse_fastpath_bounds(
        model, args, np.asarray(batch["extrin"]),
        np.asarray(batch["intrin"]), ph, pw, [(0, 0)], "[hlo]", True)
    import dataclasses
    args.fused_render = True
    model.cfg = dataclasses.replace(model.cfg, fused_render=True)
    from videoloop3d_tpu.train.stage2 import make_stage2_step
    weights = {k: jnp.asarray(0.2, jnp.float32)
               for k in ("sparsity", "rgb_smooth", "a_smooth", "d_smooth",
                         "density")}
    rng = jax.random.PRNGKey(0)
    lr = jnp.asarray(0.01, jnp.float32)
    step, opt_init = make_stage2_step(model, args, losscfg, ph, pw)
    opt_state = opt_init(params)
    low = step.lower(params, opt_state, batch, lr, weights, rng)
    txt = low.compile().as_text()
    if opts.dump:
        with open(opts.dump, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)/1e6:.1f} MB HLO to {opts.dump}")

    lines = txt.splitlines()
    if opts.ops:
        want = [o.strip() for o in opts.ops.split(",") if o.strip()]
        for w in want:
            pat = re.compile(r"%" + re.escape(w) + r"\b")
            for ln in lines:
                if pat.search(ln) and "=" in ln:
                    meta = re.search(r'op_name="([^"]*)"', ln)
                    src = re.search(r'source_file="([^"]*)".*?'
                                    r'source_line=(\d+)', ln)
                    print(f"--- {w}")
                    print("  " + ln.strip()[:300])
                    if meta:
                        print(f"  op_name: {meta.group(1)[:200]}")
                    if src:
                        print(f"  src: {src.group(1)}:{src.group(2)}")
                    break

    if opts.bytes_top:
        rows = []
        for ln in lines:
            m = re.match(r"\s*%([\w.\-]+) = (.*)", ln)
            if not m:
                continue
            name, rest = m.groups()
            if name.startswith(("constant", "parameter", "get-tuple",
                                "bitcast", "tuple", "copy-done")):
                continue
            b = buf_bytes(rest)
            if b > 50e6:
                meta = re.search(r'op_name="([^"]*)"', ln)
                rows.append((b, name, (meta.group(1)[-120:] if meta
                                       else "")))
        rows.sort(reverse=True)
        print(f"\n{'MB':>8}  op / op_name")
        for b, name, meta in rows[:opts.bytes_top]:
            print(f"{b/1e6:8.1f}  {name}")
            if meta:
                print(f"          {meta}")


if __name__ == "__main__":
    main()
