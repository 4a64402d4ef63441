"""2D guidance playground: SDS on a 2D image, no 3D.

Rebuild of the reference ``2dplayground.ipynb`` — the de-facto unit test of
the guidance + prompt layers (SURVEY §3.5, BASELINE config #1): optimize a
2D RGB image (or latent) directly with the CSD/SDS loss.

Usage:
    python playground_2d.py --prompt "a red apple" --steps 200 \
        --size 64 --model-size tiny            # hermetic, random weights
    python playground_2d.py --prompt "..." --model-size sd21 --cache-dir model
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--model-size", default="tiny", choices=["tiny", "sd21"])
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--out", default="outputs/playground2d")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dreammat_tpu
    import dreammat_tpu.models  # registry
    from dreammat_tpu.utils import saving

    guidance = dreammat_tpu.find("stable-diffusion-dreammat-guidance")(
        {
            "model_size": args.model_size,
            "width": args.size,
            "height": args.size,
            "half_precision_weights": args.model_size != "tiny",
            "cache_dir": args.cache_dir,
            "controlnet_path": None,
            "use_controlnet": False,
            "cond_scale": 1.0,
            "uncond_scale": -1.0,
            "null_scale": 0.0,
            "noise_scale": 0.0,
            "view_dependent_prompting": False,
        }
    )
    guidance.init_params(jax.random.PRNGKey(args.seed))
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {
            "prompt": args.prompt,
            "negative_prompt": args.negative_prompt,
            "model_size": args.model_size,
            "pretrained_model_cache_dir": args.cache_dir or "/nonexistent",
        }
    )
    prompt_utils = pp()

    rgb = jnp.full((1, args.size, args.size, 3), 0.5)
    tx = optax.adam(args.lr)
    opt_state = tx.init(rgb)
    zeros = jnp.zeros((1,))

    @jax.jit
    def step(rgb, opt_state, i, rng):
        def loss_fn(rgb):
            out = guidance(
                guidance.params, jnp.clip(rgb, 0, 1), prompt_utils,
                zeros, zeros, jnp.ones((1,)), None, step=i, rng=rng,
            )
            return out["loss_sds"]

        loss, g = jax.value_and_grad(loss_fn)(rgb)
        updates, opt_state = tx.update(g, opt_state, rgb)
        return optax.apply_updates(rgb, updates), opt_state, loss

    rng = jax.random.PRNGKey(args.seed + 1)
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.steps):
        rng, k = jax.random.split(rng)
        rgb, opt_state, loss = step(rgb, opt_state, jnp.int32(i), k)
        if (i + 1) % 50 == 0 or i == 0:
            dreammat_tpu.info("step %d loss=%.4f", i + 1, float(loss))
            saving.save_image(
                os.path.join(args.out, f"step{i+1:05d}.png"),
                np.asarray(jnp.clip(rgb[0], 0, 1)),
            )
    saving.save_image(os.path.join(args.out, "final.png"), np.asarray(jnp.clip(rgb[0], 0, 1)))
    dreammat_tpu.info("wrote %s", os.path.join(args.out, "final.png"))


if __name__ == "__main__":
    main()
