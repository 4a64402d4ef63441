"""Caster A/B on real hardware: Pallas tiled vs XLA plane-scan vs MT dense
scan vs BVH while-loop, across mesh sizes — derives DENSE_CAST_MAX_TRIS
from measurement (VERDICT r1 #5 crossover ask).

Usage: python tools/bench_casters.py [--rays 262144] [--subdivs 3 4 5 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)  # one 512^2 view
    ap.add_argument("--subdivs", type=int, nargs="+", default=[3, 4, 5, 6])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dreammat_tpu.models import mesh as mesh_lib
    from dreammat_tpu.ops import bvh as bvh_lib

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    o = rng.normal(size=(args.rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    tgt = rng.normal(size=(args.rays, 3)) * 0.3
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    for subdiv in args.subdivs:
        m = mesh_lib.make_icosphere(subdiv=subdiv)
        T = int(np.asarray(m.t_pos_idx).shape[0])
        bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))

        def timed(fn, name):
            try:
                out = fn()  # compile + run
                jax.block_until_ready(out["t"])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn()
                jax.block_until_ready(out["t"])
                dt = (time.perf_counter() - t0) / args.iters
                print(json.dumps({
                    "caster": name, "tris": T, "rays": args.rays,
                    "ms": round(dt * 1e3, 1),
                    "mray_per_s": round(args.rays / dt / 1e6, 1),
                }), flush=True)
                return out
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"caster": name, "tris": T, "error": str(e)[:200]}),
                      flush=True)
                return None

        outs = {}
        outs["pallas"] = timed(
            lambda: bvh_lib.cast_rays_dense_pallas(bvh, o, d), "pallas")
        outs["plane"] = timed(
            lambda: bvh_lib.cast_rays_plane(bvh, o, d), "plane")
        if T <= (1 << 18):
            outs["mt_dense"] = timed(
                lambda: bvh_lib.cast_rays_chunked.__wrapped__(bvh, o, d)
                if hasattr(bvh_lib.cast_rays_chunked, "__wrapped__")
                else bvh_lib.cast_rays_dense(bvh, o[: 1 << 16], d[: 1 << 16]),
                "mt_dense_64k")
        outs["bvh_loop"] = timed(
            lambda: bvh_lib.cast_rays(bvh, o[:65536], d[:65536]), "bvh_loop_64k")

        # cross-check pallas vs plane on full ray set
        a, b = outs.get("pallas"), outs.get("plane")
        if a is not None and b is not None:
            same_hit = np.array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
            hit = np.asarray(a["hit"]) & np.asarray(b["hit"])
            dt_max = float(np.abs(np.asarray(a["t"]) - np.asarray(b["t"]))[hit].max()) if hit.any() else 0.0
            n_bad = int((np.abs(np.asarray(a["t"]) - np.asarray(b["t"]))[hit] > 1e-3).sum()) if hit.any() else 0
            print(json.dumps({"check": "pallas_vs_plane", "tris": T,
                              "same_hit": bool(same_hit), "t_max_err": dt_max,
                              "rays_off": n_bad,
                              "ok": bool(same_hit and n_bad <= 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
