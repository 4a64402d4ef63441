"""Fine-grained train-step decomposition on real hardware (VERDICT r1 #2).

bench_train.py reports full-step and render-only-grad rates; this tool
breaks the warm step into its device phases so the next kernel can be
chosen from measurement, not guesswork:

  render_fwd          shade_view forward only
  render_grad         shade_view forward + backward (mean(comp_rgb) loss)
  hashgrid_fwd/grad   the field encode alone at the step's point count
  vae_encode_fwd/grad 512^2 -> 64^2 latents, bf16
  denoise_fwd         3x (ControlNet + UNet) at 64^2 latents (no grad flows)
  guidance_grad       encode + denoise + CSD loss backward (to the image)
  full_step           the real jitted train step (render+guidance+adam)

Usage: PYTHONPATH=.:/root/.axon_site python tools/profile_step.py [--height 512]
Writes one JSON line per phase: {"phase", "ms", "points"/"pixels"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=8, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--mesh", default="/root/reference/threestudio_dreammat/load/shapes/objs/apple.obj")
    ap.add_argument("--model-size", default="sd21")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import dreammat_tpu
    import dreammat_tpu.data
    import dreammat_tpu.models
    import dreammat_tpu.systems

    H = args.height
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
                "use_prefiltered": True,
                "environment_scale": 2.0,
            },
            "guidance": {
                "model_size": args.model_size, "width": H, "height": H,
                "cache_dir": None, "controlnet_path": None,
                "half_precision_weights": args.model_size != "tiny",
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
        }
    )
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": H, "height": H, "fix_view_num": 2, "fix_env_num": 2,
            "cond_height": min(H, 256), "cond_width": min(H, 256),
            "prerender_cache_dir": ".dreammat_tpu_cache/bench",
        },
        system.renderer, system.material,
    )
    dm.setup()
    batch = dm.collate(0)
    gb = batch["gbuffer"]
    rng = jax.random.PRNGKey(0)
    state = system.init_state(rng)
    system.on_fit_start(rng)

    renderer = system.renderer
    geometry = system.geometry
    guidance = system.guidance
    P = gb.fg_pos.shape[0]
    results = {}

    def emit(k, v):
        results[k] = v
        print(json.dumps({"phase": k, "ms": round(v, 1), "pixel_budget": P}),
              flush=True)

    # --- render forward / grad ---------------------------------------
    def render_fwd(geo_params, k):
        return renderer.shade_view(
            geo_params, gb, batch["env_id"], k, is_train=True,
            light_table=batch.get("light_table"),
            enc_maps=batch.get("enc_maps"),
        )["comp_rgb"]

    f = jax.jit(render_fwd)
    emit("render_fwd", timed(f, state["geo"], rng))

    g = jax.jit(jax.grad(lambda p, k: jnp.mean(render_fwd(p, k))))
    emit("render_grad", timed(g, state["geo"], rng))

    # --- hashgrid alone at the same point count (x2: main + jitter) ---
    pts = jnp.concatenate([gb.fg_pos, gb.fg_pos + 0.01], axis=0)

    def hg_fwd(geo_params, pts):
        return geometry.apply(geo_params, pts)

    f = jax.jit(hg_fwd)
    emit("field_fwd_2P", timed(f, state["geo"], pts))
    g = jax.jit(jax.grad(lambda p, x: jnp.sum(hg_fwd(p, x)) * 1e-6))
    emit("field_grad_2P", timed(g, state["geo"], pts))

    # --- VAE encode ----------------------------------------------------
    img = jnp.zeros((1, H, H, 3), jnp.float32)
    kk = jax.random.PRNGKey(1)

    def vae_enc(params, img):
        return guidance.encode_images(params, img, kk)

    f = jax.jit(vae_enc)
    emit("vae_encode_fwd", timed(f, guidance.params, img))
    g = jax.jit(jax.grad(lambda im: jnp.sum(vae_enc(guidance.params, im))))
    emit("vae_encode_grad", timed(g, img))

    # --- full guidance fwd+bwd to the image ---------------------------
    def guid_loss(im, k):
        out = guidance(
            guidance.params, im, system.prompt_utils,
            batch["elevation"], batch["azimuth"], batch["camera_distances"],
            batch["condition_map"], step=jnp.int32(100), rng=k,
        )
        return out["loss_sds"]

    g = jax.jit(jax.grad(guid_loss))
    emit("guidance_grad", timed(g, img[0][None], rng, iters=4))

    # --- the real train step ------------------------------------------
    fn = system._train_step_fn if getattr(system, "_train_step_fn", None) else system.make_train_step()

    def step(state, k):
        return fn(state, guidance.params, gb, batch["condition_map"],
                  batch["env_id"], batch["elevation"], batch["azimuth"],
                  batch["camera_distances"], k, batch.get("light_table"),
                  batch.get("enc_maps"))

    s2, m = step(state, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        s2, m = step(s2, jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    emit("full_step", (time.perf_counter() - t0) / n * 1e3)


if __name__ == "__main__":
    main()
