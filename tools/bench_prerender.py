"""Time the XLA-resident prerender (the Blender-subprocess replacement) on
real hardware at flagship scale: 128 views x 512^2 G-buffers, 5 envs,
256^2 condition maps + per-vertex light tables.

Reference to beat: ~15 min Blender/Cycles per mesh
(/root/reference/README.md:36). Round-1 state: ~55 min. Target: <5 min.

Usage: python tools/bench_prerender.py [--mesh PATH] [--views N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mesh",
        default="/root/reference/threestudio_dreammat/load/shapes/objs/basketball.obj",
    )
    ap.add_argument("--views", type=int, default=128)
    ap.add_argument("--envs", type=int, default=5)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--no-cache", action="store_true", default=True)
    args = ap.parse_args()

    import logging

    import jax

    import dreammat_tpu
    import dreammat_tpu.data  # noqa: F401
    import dreammat_tpu.models  # noqa: F401
    import dreammat_tpu.systems  # noqa: F401

    logging.basicConfig(level=logging.INFO, force=True)
    dreammat_tpu.logger.setLevel(logging.INFO)
    print("devices:", jax.devices(), flush=True)

    geometry = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": f"mesh:{args.mesh}",
            "shape_init_params": 0.9,
            "pos_encoding_config": {"otype": "HashGrid"},
        }
    )
    material = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "load/lights/envmap",
            "environment_scale": 2.0,
            "use_raytracing": True,
            "use_prefiltered": True,
        }
    )
    background = dreammat_tpu.find("solid-color-background")({})
    renderer = dreammat_tpu.find("raytracing-renderer")(
        {}, geometry, material, background
    )
    print("mesh:", renderer.mesh.v_pos.shape[0], "verts,",
          renderer.mesh.t_pos_idx.shape[0], "tris")

    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": args.height,
            "height": args.height,
            "fix_view_num": args.views,
            "fix_env_num": args.envs,
            "prerender_cache_dir": "/tmp/bench_prerender_cache",
        },
        renderer,
        material,
    )
    shutil.rmtree("/tmp/bench_prerender_cache", ignore_errors=True)

    t0 = time.time()
    dm.setup()
    jax.block_until_ready(dm.data.lightmaps)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "prerender_wall_s",
        "value": round(dt, 1),
        "unit": "s",
        "views": args.views,
        "envs": args.envs,
        "res": args.height,
        "vs_blender_15min": round(900.0 / dt, 2),
    }))


if __name__ == "__main__":
    main()
