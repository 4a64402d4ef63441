"""Verify that a diffusers-layout SD checkpoint directory converts cleanly.

Usage: python tools/check_weights.py model/
Expects subfolders unet/ vae/ text_encoder/ (and optionally ../controlnet).
Reports per-component how many tensors matched the flax param tree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(model_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from dreammat_tpu.models.diffusion import convert
    from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
    from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
    from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig

    def try_component(name, subdir, make_template, mtype):
        d = os.path.join(model_dir, subdir)
        ckpt = convert.find_checkpoint_file(d) if os.path.isdir(d) else None
        if not ckpt:
            print(f"  {name:14s}: no checkpoint found under {d}")
            return
        sd = convert.load_torch_state_dict(ckpt)
        template = make_template()
        total = len(jax.tree_util.tree_leaves(template))
        try:
            convert.torch_to_flax_params(sd, template, mtype, strict=True)
            print(f"  {name:14s}: OK — all {total} tensors matched ({os.path.basename(ckpt)})")
        except KeyError as e:
            print(f"  {name:14s}: PARTIAL — {e}")

    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 4, 1024))
    ucfg = UNetConfig.sd21()

    try_component(
        "unet", "unet",
        lambda: convert.fast_random_init(
            jax.random.PRNGKey(0),
            lambda: UNet2DCondition(ucfg).init(jax.random.PRNGKey(0), sample, t, ctx),
        ),
        "unet",
    )
    try_component(
        "vae", "vae",
        lambda: convert.fast_random_init(
            jax.random.PRNGKey(0),
            lambda: AutoencoderKL(VAEConfig.sd()).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            ),
        ),
        "vae",
    )
    try_component(
        "text_encoder", "text_encoder",
        lambda: convert.fast_random_init(
            jax.random.PRNGKey(0),
            lambda: CLIPTextModel(CLIPTextConfig.sd21()).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
            ),
        ),
        "clip",
    )
    ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22)
    try_component(
        "controlnet", "controlnet",
        lambda: convert.fast_random_init(
            jax.random.PRNGKey(0),
            lambda: ControlNet(ccfg).init(
                jax.random.PRNGKey(0), sample, t, ctx, jnp.zeros((1, 64, 64, 22))
            ),
        ),
        "controlnet",
    )


if __name__ == "__main__":
    check(sys.argv[1] if len(sys.argv) > 1 else "model")
