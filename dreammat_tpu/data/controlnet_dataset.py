"""ControlNet training dataset: loading + generation.

Rebuild of the reference dataset layer
(/root/reference/controlnet_train/diffusers_dataset.py) plus a TPU-native
replacement for the two Blender dataset-generation scripts
(controlnet_train/blender_script_{geometry,light}.py): condition stacks and
GT color renders come from the framework's own renderer.

Per-item layout (diffusers_dataset.py:108-148): 22-ch condition
(depth 1 + normal 3 + 6 probes x 3) + target color render + prompt, with
the reference's exact CFG dropout schedule (lines 148-159):
  p<0.05          -> zero all conditions
  0.05<=p<0.10    -> zero depth
  0.10<=p<0.15    -> zero normal
  0.15<=p<0.20    -> zero probes
  0.20<=p<0.50    -> empty prompt
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import dreammat_tpu


@dataclass
class ControlNetExample:
    target: np.ndarray  # [H,W,3] float32 in [0,1]
    condition: np.ndarray  # [H,W,22]
    prompt: str


class ControlNetDataset:
    """Reads either the reference's PNG directory layout
    (<root>/<obj>/{color,depth,normal,light}/...) with a prompts.json, or
    our native npz shards (<root>/<obj>/data.npz)."""

    def __init__(self, root: str, prompt_file: str, resolution: int = 256,
                 use_cfg: bool = False, env_num: int = 5, view_num: int = 16,
                 seed: int = 0):
        self.root = root
        self.resolution = resolution
        self.use_cfg = use_cfg
        self.env_num = env_num
        self.view_num = view_num
        self.rng = np.random.RandomState(seed)
        with open(prompt_file) as f:
            prompts = json.load(f)
        self.obj_info = []
        for name, prompt in prompts.items():
            sub = os.path.join(root, name)
            if os.path.isdir(sub):
                self.obj_info.append({"path": sub, "prompt": prompt, "name": name})
        self.per_obj = env_num * view_num

    def __len__(self) -> int:
        return len(self.obj_info) * self.per_obj

    def _load_png_item(self, objpath: str, view: int, env: int):
        from PIL import Image

        dim = (self.resolution, self.resolution)

        def rgb(p):
            return np.asarray(
                Image.open(p).convert("RGB").resize(dim), dtype=np.float32
            ) / 255.0

        target_p = os.path.join(objpath, "color", f"{view:03d}_color_env{env}.png")
        img = Image.open(target_p).resize(dim)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.shape[-1] == 4:
            a = arr[..., 3:4]
            target = arr[..., :3] * a + (1 - a)  # white bg like the reference
        else:
            target = arr[..., :3]
        d = np.asarray(Image.open(os.path.join(objpath, "depth", f"{view:03d}.png")).resize(dim), dtype=np.float32)
        d = d / 65535.0 if d.max() > 255 else d / 255.0
        depth = d.reshape(*dim, -1)[..., :1]
        normal = rgb(os.path.join(objpath, "normal", f"{view:03d}.png"))
        probes = []
        for tag in ("m0.0r0.0", "m0.0r0.5", "m0.0r1.0", "m1.0r0.0", "m1.0r0.5", "m1.0r1.0"):
            probes.append(rgb(os.path.join(objpath, "light", f"{view:03d}_{tag}_env{env}.png")))
        cond = np.concatenate([depth, normal] + probes, axis=-1)
        return target, cond

    def _load_npz_item(self, objpath: str, view: int, env: int):
        z = np.load(os.path.join(objpath, "data.npz"))
        target = z["colors"][view, env - 1].astype(np.float32)
        cond = np.concatenate(
            [z["depths"][view], z["normals"][view], z["lightmaps"][view, env - 1]], axis=-1
        ).astype(np.float32)
        return target, cond

    def __getitem__(self, idx: int) -> ControlNetExample:
        obj = self.obj_info[idx // self.per_obj]
        rem = idx % self.per_obj
        env = rem // self.view_num + 1
        view = rem % self.view_num
        if os.path.exists(os.path.join(obj["path"], "data.npz")):
            target, cond = self._load_npz_item(obj["path"], view, env)
        else:
            target, cond = self._load_png_item(obj["path"], view, env)
        prompt = obj["prompt"]
        if self.use_cfg:
            p = self.rng.rand()
            if p < 0.05:
                cond = np.zeros_like(cond)
            elif p < 0.10:
                cond[..., 0] = 0.0
            elif p < 0.15:
                cond[..., 1:4] = 0.0
            elif p < 0.20:
                cond[..., 4:] = 0.0
            elif p < 0.50:
                prompt = ""
        return ControlNetExample(target, cond, prompt)

    def batches(self, batch_size: int, epochs: int = 1, shuffle: bool = True):
        """Yield dict batches of stacked arrays + prompt lists."""
        n = len(self)
        for _ in range(epochs):
            order = self.rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                items = [self[int(j)] for j in order[i : i + batch_size]]
                yield {
                    "target": np.stack([it.target for it in items]),
                    "condition": np.stack([it.condition for it in items]),
                    "prompts": [it.prompt for it in items],
                }


# ---------------------------------------------------------------------------
# dataset generation (replaces blender_script_geometry.py / _light.py)
# ---------------------------------------------------------------------------

def generate_dataset_for_mesh(
    mesh_path: str,
    out_dir: str,
    material_cfg: Optional[dict] = None,
    n_views: int = 16,
    n_envs: int = 5,
    resolution: int = 256,
    gt_material: Optional[Tuple[Tuple[float, float, float], float, float]] = None,
    seed: int = 0,
    renderer_cfg: Optional[dict] = None,
):
    """Render depth/normal/probe conditions and a GT color target for one
    mesh, writing our npz layout. GT material is (albedo_rgb, metallic,
    roughness) constants (the reference uses the object's own materials in
    Blender, blender_script_light.py:195-231; textured GT is a natural
    extension once texture sampling lands in the loader)."""
    import jax
    import jax.numpy as jnp

    import dreammat_tpu.models  # registry
    from dreammat_tpu.data import cameras as cam_lib
    from dreammat_tpu.data import prerender as prerender_lib

    geo = dreammat_tpu.find("dreammat-mesh")(
        {"shape_init": f"mesh:{mesh_path}", "shape_init_params": 0.9}
    )
    mat = dreammat_tpu.find("dreammat-material")(dict(material_cfg or {}))
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")(dict(renderer_cfg or {}), geo, mat, bg)

    cam = cam_lib.make_fixed_cameras(n_views, seed=seed)
    data = prerender_lib.prerender(
        ren, mat, cam, resolution, resolution, n_envs,
        seed=seed, cache_dir=None, cond_height=resolution, cond_width=resolution,
    )

    # GT color renders with a constant material
    if gt_material is None:
        rng = np.random.RandomState(seed)
        gt_material = (tuple(0.2 + 0.7 * rng.rand(3)), float(rng.rand()), float(0.2 + 0.7 * rng.rand()))
    albedo_rgb, metal, rough = gt_material
    colors = np.zeros((n_views, n_envs, resolution, resolution, 3), dtype=np.float16)
    key = jax.random.PRNGKey(seed + 7)
    for i, gb in enumerate(data.gbuffers):
        P = gb.fg_pos.shape[0]
        alb = jnp.tile(jnp.asarray([albedo_rgb]), (P, 1))
        met = jnp.full((P, 1), metal)
        rgh = jnp.full((P, 1), rough**2)  # material layer expects squared roughness
        for e in range(n_envs):
            out = mat.shade_raytracing(
                gb.fg_pos, gb.fg_normal, gb.fg_viewdir, jnp.int32(e),
                met, rgh, alb, jax.random.fold_in(key, i * n_envs + e),
                is_train=False, mask=gb.fg_valid,
            )
            img = jnp.ones((resolution * resolution, 3))
            vals = jnp.where(gb.fg_valid[:, None], out["color"], 0.0)
            img = img.at[gb.fg_idx].set(vals)
            maskf = gb.mask.reshape(-1, 1).astype(jnp.float32)
            img = img * maskf + (1 - maskf)  # white background
            colors[i, e] = np.asarray(img.reshape(resolution, resolution, 3), dtype=np.float16)

    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "data.npz"),
        colors=colors, depths=np.asarray(data.depths),
        normals=np.asarray(data.normals), lightmaps=np.asarray(data.lightmaps),
    )
    return out_dir
