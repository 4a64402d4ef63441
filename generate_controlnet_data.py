"""ControlNet training-data generation CLI.

Replaces the reference's two Blender dataset scripts
(/root/reference/controlnet_train/blender_script_geometry.py and
blender_script_light.py + their subprocess driver): renders per-object
depth/normal/probe condition stacks and GT color targets with the
framework's own renderer, writing the npz layout ControlNetDataset reads.

Usage:
    python generate_controlnet_data.py --meshes-dir path/to/objs \
        --prompts prompts.json --out dataset/training_data \
        [--views 16 --envs 5 --resolution 256] [--shard 0/1]

prompts.json: {"obj_name_without_ext": "a prompt", ...} — objects without a
prompt entry get the file stem as prompt.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes-dir", required=True)
    ap.add_argument("--prompts", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--envs", type=int, default=5)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--env-dir", default="load/lights/envmap")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard", default="0/1", help="i/n: process jobs where idx%%n==i")
    args = ap.parse_args()

    import dreammat_tpu
    from dreammat_tpu.data.controlnet_dataset import generate_dataset_for_mesh

    shard_i, shard_n = (int(x) for x in args.shard.split("/"))
    meshes = sorted(
        glob.glob(os.path.join(args.meshes_dir, "*.obj"))
        + glob.glob(os.path.join(args.meshes_dir, "*.glb"))
        + glob.glob(os.path.join(args.meshes_dir, "*.ply"))
    )
    prompts = {}
    if args.prompts and os.path.exists(args.prompts):
        with open(args.prompts) as f:
            prompts = json.load(f)

    os.makedirs(args.out, exist_ok=True)
    out_prompts = {}
    for i, mesh_path in enumerate(meshes):
        name = os.path.splitext(os.path.basename(mesh_path))[0]
        out_prompts[name] = prompts.get(name, name.replace("_", " "))
        if i % shard_n != shard_i:
            continue
        dreammat_tpu.info("[%d/%d] generating %s", i + 1, len(meshes), name)
        generate_dataset_for_mesh(
            mesh_path,
            os.path.join(args.out, name),
            material_cfg={
                "environment_texture": args.env_dir,
                "n_environments": args.envs,
            },
            n_views=args.views,
            n_envs=args.envs,
            resolution=args.resolution,
            seed=args.seed + i,
        )
    with open(os.path.join(args.out, "prompts.json"), "w") as f:
        json.dump(out_prompts, f, indent=2)
    dreammat_tpu.info("wrote %d prompt entries", len(out_prompts))


if __name__ == "__main__":
    main()
