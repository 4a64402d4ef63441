"""Cycles-parity harness (SURVEY hard part #2, VERDICT r1 #3).

The pretrained geometry/light ControlNet was trained on Blender/Cycles
renders (/root/reference/threestudio_dreammat/threestudio/data/
blender_script_fixview.py:309-462 — 64 spp, 1 diffuse + 1 glossy bounce).
This framework replaces that prerender with its own renderer, so the
question "how far is our condition stack from what the ControlNet expects?"
must be MEASURED, not assumed. This harness reports, per condition channel
group (depth / normal / six probes):

- per-channel foreground residuals (MAE, RMSE) between our conv-bake
  condition stack and a reference stack, and
- the frozen-ControlNet response delta: both stacks pushed through the same
  ControlNet (random weights by default; --model <dir> loads real ones) and
  compared on its residual outputs — the metric that actually matters for
  guidance quality (SURVEY §7 stage 8 mitigation).

Reference stack source, in order of preference:
1. --reference-cache DIR: a real Blender PNG cache in the reference layout
   (uncond.py:536-582) rendered for the same cameras.
2. otherwise: this framework's own exact-MC probe renderer with per-ray BVH
   visibility (reference-parity estimator), roundtripped through the PNG
   cache format — isolating the fast-path (conv bake) + quantization error.

Env var knobs under test: --environment-scale sweeps the reference's
config value to minimize the residual.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUPS = {
    "depth": (0, 1),
    "normal": (1, 4),
    "probe_m0r0": (4, 7),
    "probe_m0r.5": (7, 10),
    "probe_m0r1": (10, 13),
    "probe_m1r0": (13, 16),
    "probe_m1r.5": (16, 19),
    "probe_m1r1": (19, 22),
}


def build_rig(mesh_path, n_views, n_envs, res, env_scale, mc_samples, seed=0):
    import jax

    import dreammat_tpu
    import dreammat_tpu.models  # registry
    from dreammat_tpu.data.cameras import make_fixed_cameras

    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": f"mesh:{mesh_path}",
            "shape_init_params": 0.9,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "load/lights/envmap",
            "environment_scale": env_scale,
            "n_environments": n_envs,
            "diffuse_sample_num": mc_samples,
            "specular_sample_num": mc_samples,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    cam = make_fixed_cameras(n_views, seed=seed)
    return geo, mat, ren, cam


def our_stack(ren, mat, cam, n_envs, res, cond_res):
    """Fast-path condition stack: [Nv, E, cond, cond, 22] float32 + raw depth."""
    import jax
    import jax.numpy as jnp

    from dreammat_tpu.data import prerender as pre
    from dreammat_tpu.utils import ops as uops

    data = pre.prerender(ren, mat, cam, res, res, n_envs,
                         cache_dir=None, cond_height=cond_res, cond_width=cond_res)
    Nv = len(cam)
    stacks = np.zeros((Nv, n_envs, cond_res, cond_res, 22), np.float32)
    for i in range(Nv):
        for e in range(n_envs):
            stacks[i, e] = np.concatenate(
                [
                    np.asarray(data.depths[i], np.float32),
                    np.asarray(data.normals[i], np.float32),
                    np.asarray(data.lightmaps[i, e], np.float32),
                ],
                axis=-1,
            )
    # raw scene-unit depth for the PNG writer: |fg_pos - cam_pos| scattered
    cam_pos = np.asarray(uops.camera_position_from_spherical(
        jnp.asarray(cam.elevation_deg), jnp.asarray(cam.azimuth_deg),
        jnp.asarray(cam.camera_distances)))
    H = W = res
    raw = np.zeros((Nv, H, W), np.float32)
    for i, gb in enumerate(data.gbuffers):
        t = np.linalg.norm(np.asarray(gb.fg_pos) - cam_pos[i], axis=-1)
        img = np.zeros(H * W, np.float32)
        valid = np.asarray(gb.fg_valid)
        img[np.asarray(gb.fg_idx)[valid]] = t[valid]
        raw[i] = img.reshape(H, W)
    return data, stacks, raw


def mc_reference_stack(ren, mat, cam, n_envs, res, cond_res, tmp_dir,
                       checkpoint_dir=None, view_ids=None):
    """Exact-MC probe stack with per-ray BVH visibility, roundtripped
    through the reference PNG cache layout.

    ``checkpoint_dir``: persist each completed view as an npz and skip it on
    rerun — an exact-MC view at 512^2 costs ~5 min of device time and the
    remote-TPU tunnel can drop mid-run, so the ground truth must be
    resumable (one lost pipe previously discarded a full multi-view pass).

    ``view_ids``: global camera indices of the views in ``cam`` (used when
    the caller sliced a larger canonical rig via --limit-views) so
    checkpoint files are keyed by the CANONICAL index and stay valid as
    the measured subset grows toward the full rig."""
    import jax
    import jax.numpy as jnp

    from dreammat_tpu.data import prerender as pre
    from dreammat_tpu.data.cameras import camera_rays_and_matrices

    # render_probes_for_view_exact traces renderer.trace directly and never
    # consults the material's baked-visibility/raytracer state, so no
    # state toggling is needed here.
    import time

    Nv = len(cam)
    lightmaps = np.zeros((Nv, n_envs, res, res, 18), np.float32)
    raw_depth = np.zeros((Nv, res, res), np.float32)
    normals = np.zeros((Nv, res, res, 3), np.float32)
    t_start = time.time()
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    if view_ids is None:
        view_ids = list(range(Nv))
    for i in range(Nv):
        gi = int(view_ids[i])
        ck = (os.path.join(checkpoint_dir, f"mc_view_{gi:03d}_e{n_envs}_r{res}.npz")
              if checkpoint_dir else None)
        if ck and os.path.exists(ck):
            z = np.load(ck)
            lightmaps[i], raw_depth[i], normals[i] = z["lm"], z["d"], z["n"]
            print(f"[cycles_parity] exact-MC view {i}/{Nv}: checkpoint hit",
                  flush=True)
            continue
        print(f"[cycles_parity] exact-MC view {i}/{Nv} "
              f"(elapsed {time.time() - t_start:.0f}s)", flush=True)
        cd = camera_rays_and_matrices(cam, i, res, res)
        gb = ren.build_gbuffer(cd["rays_o"], cd["rays_d"], cd["w2c"])
        probes = pre.render_probes_for_view_exact(
            ren, mat, gb, n_envs, jax.random.PRNGKey(11),
        )
        probes.block_until_ready()
        lightmaps[i] = np.asarray(probes, np.float32)
        normals[i] = np.asarray(gb.cn_normal, np.float32)
        t = np.linalg.norm(
            np.asarray(gb.fg_pos) - np.asarray(cd["camera_position"]), axis=-1
        )
        img = np.zeros(res * res, np.float32)
        valid = np.asarray(gb.fg_valid)
        img[np.asarray(gb.fg_idx)[valid]] = t[valid]
        raw_depth[i] = img.reshape(res, res)
        if ck:
            np.savez_compressed(ck + ".tmp.npz", lm=lightmaps[i], d=raw_depth[i],
                                n=normals[i])
            os.replace(ck + ".tmp.npz", ck)

    pre.write_reference_png_cache(tmp_dir, lightmaps, raw_depth, normals)
    lm, d, n = pre.load_reference_png_cache(tmp_dir, Nv, n_envs, cond_res, cond_res)
    stacks = np.concatenate(
        [d.astype(np.float32), n.astype(np.float32), lm.astype(np.float32)[:, 0]],
        axis=-1,
    )[:, None]
    if n_envs > 1:
        stacks = np.concatenate(
            [
                np.concatenate(
                    [d.astype(np.float32), n.astype(np.float32),
                     lm.astype(np.float32)[:, e]], axis=-1
                )[:, None]
                for e in range(n_envs)
            ],
            axis=1,
        )
    return stacks


def residual_table(ours, ref):
    """Per-group MAE/RMSE over foreground (ref depth > 0), plus the
    per-view RMSE spread (min/max across measured views) so 'more views
    add samples, not failure modes' is shown, not asserted (VERDICT r4 #8):
    a tight spread means the strided subset already samples the full
    residual distribution."""
    fg = ref[..., 0] > 1e-3
    rows = {}
    n_views = ours.shape[0]
    for name, (a, b) in GROUPS.items():
        d = (ours[..., a:b] - ref[..., a:b])[fg]
        view_rmse = []
        for v in range(n_views):
            dv = (ours[v, ..., a:b] - ref[v, ..., a:b])[fg[v]]
            if dv.size:
                view_rmse.append(float(np.sqrt((dv ** 2).mean())))
        rows[name] = {
            "mae": float(np.abs(d).mean()),
            "rmse": float(np.sqrt((d ** 2).mean())),
            "rmse_view_min": min(view_rmse) if view_rmse else None,
            "rmse_view_max": max(view_rmse) if view_rmse else None,
        }
    return rows


def controlnet_delta(ours, ref, model_dir=None, seeds=(0, 1, 2)):
    """Frozen-ControlNet response delta between the two stacks.

    Without trained weights (none exist in this image) the net is the real
    SD2.1 architecture at RANDOM init; since a single random net's
    sensitivity pattern is arbitrary, the delta is measured at ``seeds``
    independent inits and the per-seed spread is reported — a tight spread
    says the envelope is a property of the architecture's response to these
    condition stacks, not of one lucky draw (VERDICT r4 next #3)."""
    import jax
    import jax.numpy as jnp

    from dreammat_tpu.models.diffusion import convert
    from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
    from dreammat_tpu.models.diffusion.unet import UNetConfig

    H = ours.shape[2]
    if model_dir and os.path.isdir(os.path.join(model_dir, "controlnet")):
        ccfg = ControlNetConfig(unet=UNetConfig.sd21(), conditioning_channels=22)
        cnet = ControlNet(ccfg, dtype=jnp.bfloat16)
        lat = H // 8
        ctx_dim = 1024
        tpl = convert.fast_random_init(
            jax.random.PRNGKey(0),
            lambda: cnet.init(jax.random.PRNGKey(0), jnp.zeros((1, lat, lat, 4)),
                              jnp.zeros((1,)), jnp.zeros((1, 4, ctx_dim)),
                              jnp.zeros((1, H, H, 22))),
        )
        ckpt = convert.find_checkpoint_file(os.path.join(model_dir, "controlnet"))
        sd = convert.load_torch_state_dict(ckpt)
        param_sets = [(None, convert.torch_to_flax_params(
            sd, tpl, "controlnet", strict=True))]
        kind = "real-sd21"
    elif H >= 64:
        # random weights at the REAL architecture: stem factor 8 keeps the
        # latent at H/8 (the tiny stem factor 2 put attention at (H/2)^2
        # sequence length — 65536 tokens at H=512, an O(S^2) OOM on one chip)
        ccfg = ControlNetConfig(unet=UNetConfig.sd21(), conditioning_channels=22)
        cnet = ControlNet(ccfg, dtype=jnp.bfloat16)
        lat = H // 8
        ctx_dim = 1024
        param_sets = [
            (s, convert.fast_random_init(
                jax.random.PRNGKey(s),
                lambda: cnet.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, lat, lat, 4)),
                                  jnp.zeros((1,)), jnp.zeros((1, 4, ctx_dim)),
                                  jnp.zeros((1, H, H, 22))),
            ))
            for s in seeds
        ]
        kind = "sd21-random"
    else:
        ccfg = ControlNetConfig.tiny()
        cnet = ControlNet(ccfg)
        lat = H // 2
        ctx_dim = ccfg.unet.cross_attention_dim
        param_sets = [
            (s, cnet.init(
                jax.random.PRNGKey(s), jnp.zeros((1, lat, lat, 4)),
                jnp.zeros((1,)), jnp.zeros((1, 4, ctx_dim)),
                jnp.zeros((1, H, H, 22)),
            ))
            for s in seeds
        ]
        kind = "tiny-random"

    sample = jax.random.normal(jax.random.PRNGKey(1), (1, lat, lat, 4))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, ctx_dim))

    # params/sample/ctx are ARGUMENTS, not closure captures: jit bakes
    # captured arrays into the HLO as literal constants, so closing over
    # the 360M-param ControlNet shipped a multi-GB compile proto that
    # deterministically broke the tunneled remote_compile pipe (attempts
    # 2-3 of the round-4 parity run died at exactly this call)
    @jax.jit
    def respond(params, sample, ctx, cond):
        down, mid = cnet.apply(params, sample, t, ctx, cond, 1.0)
        return jnp.concatenate([jnp.ravel(x) for x in list(down) + [mid]])

    per_seed = []
    for seed, params in param_sets:
        deltas = []
        for i in range(ours.shape[0]):
            for e in range(ours.shape[1]):
                ra = respond(params, sample, ctx, jnp.asarray(ours[i, e])[None])
                rb = respond(params, sample, ctx, jnp.asarray(ref[i, e])[None])
                denom = float(jnp.linalg.norm(rb)) + 1e-9
                deltas.append(float(jnp.linalg.norm(ra - rb)) / denom)
        per_seed.append({
            "seed": seed,
            "rel_l2_mean": float(np.mean(deltas)),
            "rel_l2_max": float(np.max(deltas)),
        })
    return {
        "kind": kind,
        # aggregate: worst seed's mean and max — the honest envelope
        "rel_l2_mean": max(r["rel_l2_mean"] for r in per_seed),
        "rel_l2_max": max(r["rel_l2_max"] for r in per_seed),
        "per_seed": per_seed,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mesh",
        default="/root/reference/threestudio_dreammat/load/shapes/objs/apple.obj",
    )
    ap.add_argument("--reference-cache", default=None)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--envs", type=int, default=2)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--cond-res", type=int, default=256)
    ap.add_argument("--mc-samples", type=int, default=256)
    ap.add_argument("--environment-scale", type=float, nargs="+", default=[2.0])
    ap.add_argument("--model", default=None, help="dir with controlnet/ weights")
    ap.add_argument("--checkpoint", default=None,
                    help="dir for per-view exact-MC checkpoints (resume after "
                    "a dropped TPU tunnel) + the fast-path stack cache")
    ap.add_argument("--out-json", default=None,
                    help="also append each result row to this JSONL file")
    ap.add_argument("--limit-views", type=int, default=None,
                    help="measure only an evenly-strided subset of this many "
                    "views from the canonical --views rig (cameras and "
                    "checkpoints keep their canonical indices, so partial "
                    "full-scale runs stay resumable and comparable)")
    args = ap.parse_args()

    for env_scale in args.environment_scale:
        geo, mat, ren, cam = build_rig(
            args.mesh, args.views, args.envs, args.res, env_scale, args.mc_samples
        )
        view_ids = list(range(args.views))
        kv = args.views
        if args.limit_views and args.limit_views < args.views:
            kv = args.limit_views
            sel = np.unique(np.round(
                np.linspace(0, args.views - 1, kv)).astype(int))
            view_ids = [int(s) for s in sel]
            from dreammat_tpu.data.cameras import CameraSet

            cam = CameraSet(
                cam.elevation_deg[sel], cam.azimuth_deg[sel],
                cam.camera_distances[sel], cam.fovy_deg[sel],
            )
        ours_ck = (os.path.join(
            args.checkpoint,
            f"ours_v{args.views}k{kv}_e{args.envs}_r{args.res}_s{env_scale}.npz")
            if args.checkpoint else None)
        if ours_ck and os.path.exists(ours_ck):
            ours = np.load(ours_ck)["stacks"]
            print("[cycles_parity] fast-path stack: checkpoint hit", flush=True)
        else:
            data, ours, raw = our_stack(
                ren, mat, cam, args.envs, args.res, args.cond_res)
            if ours_ck:
                os.makedirs(args.checkpoint, exist_ok=True)
                np.savez_compressed(ours_ck + ".tmp.npz", stacks=ours)
                os.replace(ours_ck + ".tmp.npz", ours_ck)
        if args.reference_cache:
            from dreammat_tpu.data import prerender as pre

            lm, d, n = pre.load_reference_png_cache(
                args.reference_cache, args.views, args.envs,
                args.cond_res, args.cond_res,
            )
            ref = np.concatenate(
                [
                    np.concatenate(
                        [d.astype(np.float32), n.astype(np.float32),
                         lm.astype(np.float32)[:, e]], axis=-1
                    )[:, None]
                    for e in range(args.envs)
                ],
                axis=1,
            )
            src = "blender-cache"
        else:
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                ref = mc_reference_stack(
                    ren, mat, cam, args.envs, args.res, args.cond_res, td,
                    checkpoint_dir=args.checkpoint, view_ids=view_ids,
                )
            src = "exact-mc-roundtrip"

        table = residual_table(ours, ref)
        cn = controlnet_delta(ours, ref, args.model)
        row = {
            "mesh": os.path.basename(args.mesh), "reference": src,
            "views": args.views, "measured_views": len(view_ids),
            "envs": args.envs, "res": args.res,
            "mc_samples": args.mc_samples,
            "environment_scale": env_scale, "residuals": table,
            "controlnet_delta": cn,
        }
        print(json.dumps(row), flush=True)
        if args.out_json:
            with open(args.out_json, "a") as fh:
                fh.write(json.dumps(row) + "\n")

        print(f"\n# {os.path.basename(args.mesh)} vs {src} (env_scale={env_scale})")
        print("| channel group | MAE | RMSE | per-view RMSE min..max |")
        print("|---|---|---|---|")
        for name, r in table.items():
            spread = (f"{r['rmse_view_min']:.4f}..{r['rmse_view_max']:.4f}"
                      if r.get("rmse_view_min") is not None else "n/a")
            print(f"| {name} | {r['mae']:.4f} | {r['rmse']:.4f} | {spread} |")
        print(f"\nControlNet ({cn['kind']}) response rel-L2 (worst seed): "
              f"mean {cn['rel_l2_mean']:.4f}, max {cn['rel_l2_max']:.4f}")
        for r in cn.get("per_seed", []):
            print(f"  seed {r['seed']}: mean {r['rel_l2_mean']:.4f}, "
                  f"max {r['rel_l2_max']:.4f}")


if __name__ == "__main__":
    main()
