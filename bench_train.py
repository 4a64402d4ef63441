"""Warm train-step throughput for the full DreamMat pipeline (one chip).

Measures the end-to-end optimization step (hashgrid field -> streamed MC
shading -> VAE encode -> 3x ControlNet+UNet -> CSD grad -> Adam) at
flagship scale, excluding compile, and reports the implied wall-clock for a
3000-step mesh. Complements bench.py (denoise-only north star).

Usage: python bench_train.py [--steps 20] [--height 512] [--mesh path.obj]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--mesh", default="/root/reference/threestudio_dreammat/load/shapes/objs/apple.obj")
    ap.add_argument("--model-size", default="sd21")
    ap.add_argument("--shading-chunk", type=int, default=8)
    ap.add_argument("--static-budget-mb", type=int, default=6144,
                    help="HBM budget for resident static field maps; set "
                    "below views*~180MB to force the rotating window")
    ap.add_argument("--rotate", type=int, default=8,
                    help="static_maps_rotate (0 = dynamic backward for "
                    "non-resident views)")
    ap.add_argument("--no-static-maps", action="store_true",
                    help="disable static field maps entirely (dynamic "
                    "scatter backward baseline)")
    ap.add_argument("--regime", default="tables",
                    choices=["tables", "mc-baked", "mc-pixel", "mc-raytrace",
                             "hybrid8"],
                    help="shading regime: 'tables' = prefiltered light "
                    "tables (default fast path); 'mc-baked' = per-sample MC "
                    "estimator with baked per-VERTEX visibility lookups; "
                    "'mc-pixel' = per-sample MC with baked per-PIXEL tables "
                    "(the gate's highest-fidelity fallback); 'mc-raytrace' "
                    "= per-ray BVH visibility (reference-parity exact "
                    "estimator); 'hybrid8' = tables with every 8th step "
                    "through the MC estimator")
    args = ap.parse_args()

    import jax

    import dreammat_tpu
    import dreammat_tpu.data  # registry
    import dreammat_tpu.models  # registry
    import dreammat_tpu.systems  # registry

    H = args.height
    tiny = args.model_size == "tiny"
    system = dreammat_tpu.find("dreammat-system")(
        {
            "init_width": H, "init_height": H,
            "geometry": {
                "shape_init": f"mesh:{args.mesh}",
                "shape_init_params": 0.7,
                "shape_init_mesh_up": "+y",
                "shape_init_mesh_front": "+z",
            },
            "material": {
                "environment_texture": "/nonexistent",
                "diffuse_sample_num": 200,
                "specular_sample_num": 128,
                "shading_chunk": args.shading_chunk,
                "use_prefiltered": True,
                "environment_scale": 2.0,
            },
            "guidance": {
                "model_size": args.model_size,
                "width": H, "height": H,
                "cache_dir": None, "controlnet_path": None,
                "half_precision_weights": not tiny,
                "cond_scale": 1.05,
                "uncond_scale": [0, -1.0, -0.5, 2000],
                "null_scale": [0, 0.0, -0.5, 2000],
                "min_step_percent": [500, 0.2, 0.02, 501],
                "max_step_percent": [500, 0.8, 0.5, 501],
            },
            "prompt_processor": {
                "prompt": "a benchmark apple", "model_size": args.model_size,
                "use_cache": False,
            },
            "renderer": (
                {"visibility_mode": "raytrace"}
                if args.regime == "mc-raytrace" else {}
            ),
        }
    )
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": H, "height": H,
            "fix_view_num": args.views, "fix_env_num": 2,
            "cond_height": min(H, 256), "cond_width": min(H, 256),
            "prerender_cache_dir": ".dreammat_tpu_cache/bench",
            "static_field_maps": not args.no_static_maps,
            "static_maps_budget_mb": args.static_budget_mb,
            "static_maps_rotate": args.rotate,
            "visibility_pixel_tables": args.regime == "mc-pixel",
            "hybrid_mc_every": 8 if args.regime == "hybrid8" else 0,
            # the regime is selected EXPLICITLY here; without this the auto
            # gate tripped on apple (abs RMSE 0.0996 > 0.08) and silently
            # turned the 'tables' row into an mc_baked measurement
            "fastpath_check": False,
        },
        system.renderer, system.material,
    )
    t0 = time.time()
    dm.setup()
    t_pre = time.time() - t0
    dreammat_tpu.info("prerender (%d views): %.1fs", args.views, t_pre)
    if args.regime not in ("tables", "hybrid8") and dm.data is not None:
        # drop the prefiltered light tables: every step shades through the
        # MC estimator (visibility from the baked per-vertex/per-pixel
        # table, or BVH rays in mc-raytrace) — the regimes the fastpath
        # gate switches to
        dm.data.table_spec = None

    state = system.fit(
        dm, max_steps=args.steps, seed=0, trial_dir="/tmp/bench_train",
        val_check_interval=0, checkpoint_every=0, log_every=args.steps,
    )
    # fit logs warm it/s; recompute here for the JSON line
    import jax.numpy as jnp

    fn = system._train_step_fn
    batch = dm.collate(0)
    rng = jax.random.PRNGKey(0)
    state, m = fn(state, system.guidance.params, batch["gbuffer"], batch["condition_map"],
                  batch["env_id"], batch["elevation"], batch["azimuth"],
                  batch["camera_distances"], rng, batch.get("light_table"),
                  batch.get("enc_maps"))
    float(m["loss"])  # value pull: through the remote tunnel
    # block_until_ready does not reliably block (see bench.py)
    n = 10
    # (a) fixed batch: pure device step rate (no host collate / H2D)
    t1 = time.time()
    for i in range(n):
        state, m = fn(state, system.guidance.params, batch["gbuffer"], batch["condition_map"],
                      batch["env_id"], batch["elevation"], batch["azimuth"],
                      batch["camera_distances"], jax.random.fold_in(rng, i),
                      batch.get("light_table"), batch.get("enc_maps"))
    float(m["loss"])
    sps_device = n / (time.time() - t1)
    # (b) fresh batch each step: includes collate + transfers
    t1 = time.time()
    for i in range(n):
        batch = dm.collate(i)
        state, m = fn(state, system.guidance.params, batch["gbuffer"], batch["condition_map"],
                      batch["env_id"], batch["elevation"], batch["azimuth"],
                      batch["camera_distances"], jax.random.fold_in(rng, i),
                      batch.get("light_table"), batch.get("enc_maps"))
    float(m["loss"])
    dt = time.time() - t1
    sps = n / dt
    dreammat_tpu.info("device-only %.2f it/s, with-collate %.2f it/s", sps_device, sps)

    # decompose: render-only loss backward (no guidance) vs full step
    import jax.numpy as jnp2

    renderer = system.renderer

    def render_loss(geo_params, gbuffer, env_id, rng, light_table, enc_maps=None):
        out = renderer.shade_view(geo_params, gbuffer, env_id, rng, is_train=True,
                                  light_table=light_table, enc_maps=enc_maps)
        return jnp2.mean(out["comp_rgb"]) + out["loss_mat_reg"]

    try:
        rstep = jax.jit(jax.grad(render_loss))

        def drain(tree):
            leaf = jax.tree_util.tree_leaves(tree)[0]
            float(jnp2.asarray(leaf).ravel()[0])

        g = rstep(state["geo"], batch["gbuffer"], batch["env_id"], rng, batch.get("light_table"),
                  batch.get("enc_maps"))
        drain(g)
        t1 = time.time()
        for i in range(n):
            g = rstep(state["geo"], batch["gbuffer"], batch["env_id"],
                      jax.random.fold_in(rng, i), batch.get("light_table"),
                      batch.get("enc_maps"))
        drain(g)
        sps_render = n / (time.time() - t1)
        dreammat_tpu.info("render-only grad: %.2f it/s", sps_render)
    except Exception as e:  # diagnostic only; never block the main numbers
        dreammat_tpu.warn("render-only decomposition failed: %s", e)
    mins_per_mesh = 3000 / sps / 60
    print(json.dumps({
        "metric": "full_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "regime": args.regime,
        "device_only_steps_per_sec": round(sps_device, 3),
        "mins_per_mesh_3000_steps": round(mins_per_mesh, 2),
        "prerender_secs_per_view": round(t_pre / args.views, 2),
    }))


if __name__ == "__main__":
    main()
