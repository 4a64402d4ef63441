"""Quantify the fast-path approximation chain (VERDICT r1 #4).

The default training path stacks three approximations on top of the exact
Monte-Carlo estimator the reference optimizes
(/root/reference/threestudio_dreammat/threestudio/models/materials/
dreammat_material.py:615-677):

    per-vertex octahedral visibility (oct_res bins)
      -> shadowed-radiance cache
        -> K-level GGX split-sum tables (prerender.TABLE_ALPHAS)

This tool measures, against exact MC shading with true per-ray BVH
visibility (the reference-parity path):

- image RMSE of the shaded color, per (metallic, roughness) combo
- cosine similarity of d(loss)/d(material features) — does the fast path
  pull the optimizer in the same direction?

across meshes (smooth / thin "light-leak" slabs / self-occluding torus /
a real example mesh) x oct_res in {8, 16, 32} x environments.

Writes a markdown table to stdout and one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_slabs():
    """Two parallel THIN slabs: vertex-resolution visibility famously leaks
    light through thin geometry; this is the adversarial case."""
    from dreammat_tpu.models.mesh import Mesh, compute_vertex_normals
    import jax.numpy as jnp

    def slab(z0, z1, n=8):
        xs = np.linspace(-1, 1, n)
        v, f = [], []
        for z in (z0, z1):
            base = len(v)
            for y in xs:
                for x in xs:
                    v.append([x, y, z])
            for i in range(n - 1):
                for j in range(n - 1):
                    a = base + i * n + j
                    if z == z1:
                        f += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
                    else:
                        f += [[a, a + n, a + 1], [a + 1, a + n, a + n + 1]]
        return np.asarray(v, np.float32), np.asarray(f, np.int64)

    v1, f1 = slab(0.0, 0.04)     # thin slab near z=0
    v2, f2 = slab(0.5, 0.54)     # second slab casting a shadow on the first
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    nrm = compute_vertex_normals(v, f)
    return Mesh(jnp.asarray(v), jnp.asarray(f, jnp.int32), jnp.asarray(nrm))


def make_torus(R=0.7, r=0.28, nu=48, nv=24):
    """Self-occluding geometry (the inner tube shadows itself)."""
    from dreammat_tpu.models.mesh import Mesh, compute_vertex_normals
    import jax.numpy as jnp

    v, f = [], []
    for i in range(nu):
        a = 2 * np.pi * i / nu
        for j in range(nv):
            b = 2 * np.pi * j / nv
            v.append([
                (R + r * np.cos(b)) * np.cos(a),
                (R + r * np.cos(b)) * np.sin(a),
                r * np.sin(b),
            ])
    for i in range(nu):
        for j in range(nv):
            # winding chosen so area-weighted vertex normals point OUTWARD
            # (major x minor tangent order). The pre-round-4 winding was
            # inverted: every vertex normal pointed INTO the tube, so every
            # visibility-bake origin (pt + eps*nrm) sat INSIDE the closed
            # surface and all sphere directions hit — tables all-zero, and
            # the exact estimator sampled its hemisphere around an inward
            # normal. Every historical "torus" row measured an inside-out
            # torus (see ROADMAP #44).
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            f += [[a, b, c], [a, c, d]]
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int64)
    nrm = compute_vertex_normals(v, f)
    m = Mesh(jnp.asarray(v), jnp.asarray(f, jnp.int32), jnp.asarray(nrm))
    assert_outward_normals(m, "torus")
    return m


def assert_outward_normals(mesh, name, frac=0.5):
    """Benchmark-mesh orientation guard: cast a ray along each vertex
    normal; on a correctly-oriented mesh the majority must escape (the
    torus' inner ring legitimately re-hits the far wall, so the bar is
    0.5, not ~1.0 — an inside-out mesh traps ~100% of them, which
    silently turns every visibility table to zero; the bug this guard
    exists to catch)."""
    from dreammat_tpu.ops import bvh as bvh_lib
    import jax.numpy as jnp

    bvh = bvh_lib.build_bvh(mesh.v_pos, mesh.t_pos_idx)
    o = mesh.v_pos + mesh.v_nrm * 1e-3
    out = bvh_lib.cast_rays_chunked(bvh, o, mesh.v_nrm, chunk=1 << 16)
    escaped = float(1.0 - jnp.mean(out["hit"].astype(jnp.float32)))
    assert escaped > frac, (
        f"{name}: only {escaped:.1%} of normal rays escape - normals look "
        f"inward/inverted; visibility bakes would be all-zero")


MR_COMBOS = [(0.0, 0.3), (0.9, 0.5), (0.5, 0.1), (0.0, 0.9)]


def run(mesh_name, mesh_or_path, oct_resolutions, n_envs, res, mc_samples, seed=0,
        grad_pixels=16384, supersample=1, subdiv=0):
    import jax
    import jax.numpy as jnp

    import dreammat_tpu
    import dreammat_tpu.models  # registry
    from dreammat_tpu.data import prerender as pre
    from dreammat_tpu.data.cameras import camera_rays_and_matrices, make_fixed_cameras
    from dreammat_tpu.models.mesh import make_icosphere  # noqa: F401
    from dreammat_tpu.ops import visibility as vis_lib

    geo_cfg = {
        "pos_encoding_config": {
            "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
            "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
        },
    }
    if isinstance(mesh_or_path, str):
        geo = dreammat_tpu.find("dreammat-mesh")(
            dict(geo_cfg, shape_init=f"mesh:{mesh_or_path}", shape_init_params=0.9)
        )
    else:
        geo = dreammat_tpu.find("dreammat-mesh")(
            dict(geo_cfg, shape_init="procedural:sphere")
        )
        geo.set_mesh(mesh_or_path)
    if subdiv:
        # same surface, 4^subdiv denser visibility sampling: the exact-MC
        # ground truth is invariant; only the baked tables gain density
        # (renderer config visibility_subdiv applies this in production)
        from dreammat_tpu.models.mesh import subdivide_mesh

        geo.set_mesh(subdivide_mesh(geo.isosurface(), subdiv))

    mat_cfg = {
        "environment_texture": "load/lights/envmap",
        "environment_scale": 2.0,
        "n_environments": n_envs,
        "diffuse_sample_num": mc_samples,
        "specular_sample_num": mc_samples,
        "use_prefiltered": True,
        # stream the exact MC estimator (res 256^2 x several hundred samples
        # would otherwise materialize a ~17 GB ray x sample buffer)
        "shading_chunk": 8,
    }
    # exact reference-parity ground truth: per-ray BVH visibility
    mat = dreammat_tpu.find("dreammat-material")(mat_cfg)
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")(
        {"visibility_mode": "raytrace"}, geo, mat, bg
    )
    cam = make_fixed_cameras(2, seed=seed)
    gbs = [
        ren.build_gbuffer(
            *(lambda cd: (cd["rays_o"], cd["rays_d"], cd["w2c"]))(
                camera_rays_and_matrices(cam, i, res, res)
            )
        )
        for i in range(2)
    ]
    cds = [camera_rays_and_matrices(cam, i, res, res) for i in range(2)]

    rows = []
    for env_id in range(n_envs):
        for vi, gb in enumerate(gbs):
            valid = np.asarray(gb.fg_valid)

            def shade_exact(m, r):
                P = gb.fg_pos.shape[0]
                return mat.shade_raytracing(
                    gb.fg_pos, gb.fg_normal, gb.fg_viewdir, jnp.int32(env_id),
                    jnp.full((P, 1), m), jnp.full((P, 1), r),
                    jnp.full((P, 3), 0.6),
                    jax.random.PRNGKey(7), is_train=False, mask=gb.fg_valid,
                )

            gt = {mr: np.asarray(shade_exact(*mr)["color"])[valid] for mr in MR_COMBOS}

            # exact-path gradient direction (loss = weighted color sum).
            # Gradients are compared on a pixel subset: the full budget at
            # 256^2 OOMs one chip through the streamed-MC vjp, and the
            # cosine needs direction, not every pixel.
            P = gb.fg_pos.shape[0]
            GP = min(grad_pixels, P)
            sl = lambda a: a[:GP]
            W = jax.random.uniform(jax.random.PRNGKey(3), (GP, 3))

            def loss_exact(feats):
                out, _ = mat(
                    sl(gb.fg_pos), feats, feats, sl(gb.fg_viewdir),
                    sl(gb.fg_normal),
                    jnp.int32(env_id), jax.random.PRNGKey(7), is_train=False,
                    mask=sl(gb.fg_valid),
                )
                return jnp.sum(out["color"] * W)

            g_gt = np.asarray(jax.grad(loss_exact)(jnp.zeros((GP, 5))))

            # sample-pattern floor: the exact estimator itself is a
            # finite-sample MC estimate; on hard-occlusion geometry (torus)
            # the gradient direction is sensitive to WHICH direction set is
            # drawn. Cosine between two independent train-mode patterns is
            # the ceiling any approximation can be expected to reach.
            def loss_exact_key(feats, key):
                out, _ = mat(
                    sl(gb.fg_pos), feats, feats, sl(gb.fg_viewdir),
                    sl(gb.fg_normal),
                    jnp.int32(env_id), key, is_train=True,
                    mask=sl(gb.fg_valid),
                )
                return jnp.sum(out["color"] * W)

            z = jnp.zeros((GP, 5))
            g_a = np.asarray(jax.grad(loss_exact_key)(z, jax.random.PRNGKey(11)))
            g_b = np.asarray(jax.grad(loss_exact_key)(z, jax.random.PRNGKey(1011)))
            floor_cos = float(
                np.sum(g_a * g_b)
                / (np.linalg.norm(g_a) * np.linalg.norm(g_b) + 1e-12)
            )

            for oct_res in oct_resolutions:
                baked = vis_lib.bake_vertex_visibility(
                    ren.bvh, ren.mesh.v_pos, ren.mesh.v_nrm, oct_res=oct_res,
                    supersample=supersample,
                )
                mat.set_baked_visibility(baked)
                lvis, e_d, fg_lut, _ = pre.mesh_bakes(ren, mat, n_envs)
                _, tabs = pre.render_probes_for_view(
                    ren, mat, gb, n_envs, cds[vi]["camera_position"],
                    lvis=lvis, e_d_vertex=e_d, oct_res=oct_res, fg_lut=fg_lut,
                )
                table = jnp.asarray(tabs[env_id], jnp.float32)

                rmses = {}
                for mr in MR_COMBOS:
                    m, r = mr
                    pf = mat.shade_prefiltered(
                        gb.fg_normal, gb.fg_viewdir,
                        jnp.full((P, 1), m), jnp.full((P, 1), r),
                        jnp.full((P, 3), 0.6), table,
                        vis_data=(gb.fg_tri, gb.fg_bary),
                    )
                    c = np.asarray(pf["color"])[valid]
                    rmses[mr] = float(np.sqrt(np.mean((c - gt[mr]) ** 2)))

                def loss_pf(feats):
                    out, _ = mat(
                        sl(gb.fg_pos), feats, feats, sl(gb.fg_viewdir),
                        sl(gb.fg_normal),
                        jnp.int32(env_id), jax.random.PRNGKey(7), is_train=False,
                        mask=sl(gb.fg_valid),
                        vis_data=(sl(gb.fg_tri), sl(gb.fg_bary)),
                        light_table=table,
                    )
                    return jnp.sum(out["color"] * W)

                g_pf = np.asarray(jax.grad(loss_pf)(jnp.zeros((GP, 5))))
                cos = float(
                    np.sum(g_pf * g_gt)
                    / (np.linalg.norm(g_pf) * np.linalg.norm(g_gt) + 1e-12)
                )

                # --- mc_baked: the SAME GGX-lobe MC estimator as the exact
                # path, but each sample direction's visibility comes from the
                # 4-gather bilinear octahedral table instead of a BVH trace.
                # Prefiltering destroys the lobe x visibility correlation
                # (round-3 root cause of torus grad-cos 0.23); this mode
                # keeps it — the table only approximates vis(omega), and the
                # estimator still multiplies it per sample. This is what the
                # fastpath gate falls back to (visibility_mode="baked" +
                # table_spec=None), so its fidelity is the one that matters.
                rmses_mc = {}
                for mr in MR_COMBOS:
                    m, r = mr
                    mc = mat.shade_raytracing(
                        gb.fg_pos, gb.fg_normal, gb.fg_viewdir,
                        jnp.int32(env_id),
                        jnp.full((P, 1), m), jnp.full((P, 1), r),
                        jnp.full((P, 3), 0.6),
                        jax.random.PRNGKey(7), is_train=False,
                        mask=gb.fg_valid, vis_data=(gb.fg_tri, gb.fg_bary),
                    )
                    c = np.asarray(mc["color"])[valid]
                    rmses_mc[mr] = float(np.sqrt(np.mean((c - gt[mr]) ** 2)))

                def loss_mc(feats):
                    out, _ = mat(
                        sl(gb.fg_pos), feats, feats, sl(gb.fg_viewdir),
                        sl(gb.fg_normal),
                        jnp.int32(env_id), jax.random.PRNGKey(7),
                        is_train=False, mask=sl(gb.fg_valid),
                        vis_data=(sl(gb.fg_tri), sl(gb.fg_bary)),
                    )
                    return jnp.sum(out["color"] * W)

                g_mc = np.asarray(jax.grad(loss_mc)(jnp.zeros((GP, 5))))
                cos_mc = float(
                    np.sum(g_mc * g_gt)
                    / (np.linalg.norm(g_mc) * np.linalg.norm(g_gt) + 1e-12)
                )
                mat.set_baked_visibility(None)  # restore exact mode

                # --- mc_pixel: per-PIXEL baked tables (fixed-camera rig,
                # one-time P x O^2 rays per view) — removes the barycentric
                # spatial error of the per-vertex tables; the residual vs
                # exact is directional binning only (ops/visibility.py::
                # PixelVisibility).
                pix = vis_lib.bake_pixel_visibility(
                    ren.bvh, gb.fg_pos, gb.fg_normal, oct_res=oct_res,
                    supersample=supersample,
                )
                rmses_px = {}
                for mr in MR_COMBOS:
                    m, r = mr
                    mc = mat.shade_raytracing(
                        gb.fg_pos, gb.fg_normal, gb.fg_viewdir,
                        jnp.int32(env_id),
                        jnp.full((P, 1), m), jnp.full((P, 1), r),
                        jnp.full((P, 3), 0.6),
                        jax.random.PRNGKey(7), is_train=False,
                        mask=gb.fg_valid, vis_data=pix,
                    )
                    c = np.asarray(mc["color"])[valid]
                    rmses_px[mr] = float(np.sqrt(np.mean((c - gt[mr]) ** 2)))

                pix_sub = vis_lib.PixelVisibility(
                    table=pix.table[:GP], oct_res=oct_res)

                def loss_px(feats):
                    out, _ = mat(
                        sl(gb.fg_pos), feats, feats, sl(gb.fg_viewdir),
                        sl(gb.fg_normal),
                        jnp.int32(env_id), jax.random.PRNGKey(7),
                        is_train=False, mask=sl(gb.fg_valid),
                        vis_data=pix_sub,
                    )
                    return jnp.sum(out["color"] * W)

                g_px = np.asarray(jax.grad(loss_px)(jnp.zeros((GP, 5))))
                cos_px = float(
                    np.sum(g_px * g_gt)
                    / (np.linalg.norm(g_px) * np.linalg.norm(g_gt) + 1e-12)
                )

                row = {
                    "mesh": mesh_name, "env": env_id, "view": vi,
                    "oct_res": oct_res, "subdiv": subdiv,
                    "rmse_mean": float(np.mean(list(rmses.values()))),
                    "rmse_max": float(np.max(list(rmses.values()))),
                    "grad_cos": cos,
                    "grad_cos_floor": floor_cos,
                    "rmse_mc_mean": float(np.mean(list(rmses_mc.values()))),
                    "rmse_mc_max": float(np.max(list(rmses_mc.values()))),
                    "grad_cos_mc": cos_mc,
                    "rmse_px_mean": float(np.mean(list(rmses_px.values()))),
                    "rmse_px_max": float(np.max(list(rmses_px.values()))),
                    "grad_cos_px": cos_px,
                    **{f"rmse_m{m}r{r}": v for (m, r), v in rmses.items()},
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--envs", type=int, default=2)
    ap.add_argument("--mc-samples", type=int, default=256)
    ap.add_argument("--oct", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--grad-pixels", type=int, default=16384,
                    help="pixel subset for the gradient-cosine (the "
                    "streamed-MC vjp residuals OOM one chip on high-tri "
                    "meshes at the full budget)")
    ap.add_argument("--meshes", nargs="+",
                    default=["sphere", "slabs", "torus", "apple"])
    ap.add_argument("--supersample", type=int, default=1,
                    help="jittered rays per oct bin axis in the visibility "
                    "bake (fractional bins; see ops/visibility.py)")
    ap.add_argument("--subdiv", type=int, default=0,
                    help="midpoint-subdivision levels before baking "
                    "(renderer visibility_subdiv; 4^n denser tables on the "
                    "same surface)")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"],
                    help="force a jax backend (the image pins "
                    "JAX_PLATFORMS=axon via sitecustomize, so the env var "
                    "alone cannot select cpu; this goes through jax.config "
                    "before backend init)")
    ap.add_argument("--out-json", default=None,
                    help="append every per-(mesh,oct,env) row to this JSONL")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dreammat_tpu.models.mesh import make_icosphere

    catalog = {
        "sphere": lambda: make_icosphere(3),
        "slabs": make_slabs,
        "torus": make_torus,
        # tessellation sweep: the per-vertex tables interpolate prefiltered
        # radiance ACROSS vertices, so fidelity should scale with vertex
        # density relative to image resolution (torus at 48x24=1152 verts is
        # far coarser than any real Objaverse mesh)
        "torus_hi": lambda: make_torus(nu=96, nv=48),
        "torus_xhi": lambda: make_torus(nu=192, nv=96),
        "apple": lambda: (
            "/root/reference/threestudio_dreammat/load/shapes/objs/apple.obj"
        ),
    }
    all_rows = []
    for name in args.meshes:
        m = catalog[name]()
        all_rows += run(name, m, args.oct, args.envs, args.res, args.mc_samples,
                        grad_pixels=args.grad_pixels,
                        supersample=args.supersample, subdiv=args.subdiv)
        if args.out_json:
            import json as _json

            with open(args.out_json, "a") as fh:
                for r in [r for r in all_rows if r["mesh"] == name]:
                    fh.write(_json.dumps(
                        {k: (float(v) if hasattr(v, "item") else v)
                         for k, v in r.items()}) + "\n")

    # markdown summary: per (mesh, oct_res) averaged over envs/views
    print("\n| mesh | oct_res | RMSE tables | grad cos tables | RMSE mc_baked "
          "| grad cos mc_baked | RMSE mc_pixel | grad cos mc_pixel "
          "| grad cos floor |")
    print("|---|---|---|---|---|---|---|---|---|")
    seen = {}
    for r in all_rows:
        k = (r["mesh"], r["oct_res"])
        seen.setdefault(k, []).append(r)
    for (mesh, oc), rs in seen.items():
        print(
            f"| {mesh} | {oc} | "
            f"{np.mean([r['rmse_mean'] for r in rs]):.4f} | "
            f"{np.mean([r['grad_cos'] for r in rs]):.4f} | "
            f"{np.mean([r.get('rmse_mc_mean', float('nan')) for r in rs]):.4f} | "
            f"{np.mean([r.get('grad_cos_mc', float('nan')) for r in rs]):.4f} | "
            f"{np.mean([r.get('rmse_px_mean', float('nan')) for r in rs]):.4f} | "
            f"{np.mean([r.get('grad_cos_px', float('nan')) for r in rs]):.4f} | "
            f"{np.mean([r.get('grad_cos_floor', float('nan')) for r in rs]):.4f} |"
        )


if __name__ == "__main__":
    main()
