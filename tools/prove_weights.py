"""One-command real-weight proof kit: convert -> 2D playground -> tiny E2E.

No SD2.1/ControlNet weights ship in this image, so everything past the
manifest-bijection proofs has only ever run with random init. This script is
the recipe the first weights-capable machine runs to demonstrate the full
chain with zero additional work (reference load path:
threestudio_dreammat/threestudio/models/guidance/dreammat_guidance.py:88-202):

    # 1. fetch diffusers-layout checkpoints (any machine with egress):
    #      huggingface-cli download stabilityai/stable-diffusion-2-1-base \
    #          --local-dir model
    #      huggingface-cli download zzzyuqing/dreammat-controlnet \
    #          --local-dir model/controlnet       # geometry+light ControlNet
    python tools/prove_weights.py --model-dir model/        # full proof
    python tools/prove_weights.py                           # hermetic dry run

Hermetic mode (no --model-dir) synthesizes a tiny diffusers-layout
checkpoint directory from random flax trees via the torch exporter, then
runs the SAME three stages — proving the kit end-to-end on any machine:

  stage 1  convert   strict torch->flax conversion of unet/vae/text_encoder
                     (+controlnet when present); every tensor must match.
  stage 2  2dplay    SDS optimization of a 2D image through the converted
                     weights (reference 2dplayground.ipynb, SURVEY §3.5);
                     asserts finite decreasing-capable loss + image output.
  stage 3  e2e       a few launch.py --train steps on a procedural mesh with
                     the converted weights wired into the guidance.

With real weights, stage 2's final.png is the qualitative check (a
recognizable render of the prompt) and the printed CLIP-similarity hook is
where FID/CLIP parity vs the reference is measured.

Exit code 0 = every stage green. Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(msg):
    print(f"[prove_weights] {msg}", flush=True)


# ---------------------------------------------------------------------------
# fixture synthesis (hermetic mode)
# ---------------------------------------------------------------------------

def synthesize_fixture(out_dir: str) -> None:
    """Write a tiny diffusers-layout checkpoint tree from random flax params
    through the torch exporter (convert.flax_to_torch_state_dict), so the
    strict importer sees exactly the key/layout surface real checkpoints have."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreammat_tpu.models.diffusion import convert
    from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
    from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
    from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22,
                            conditioning_embedding_channels=(16, 32))
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 4, ucfg.cross_attention_dim))
    f = 2 ** (len(ccfg.conditioning_embedding_channels) - 1)
    cond = jnp.zeros((1, 8 * f, 8 * f, 22))
    rgb = jnp.zeros((1, 32, 32, 3))
    toks = jnp.zeros((1, 8), jnp.int32)

    comps = {
        "unet": ("unet", UNet2DCondition(ucfg).init(jax.random.PRNGKey(1), sample, t, ctx)),
        "vae": ("vae", AutoencoderKL(vcfg).init(jax.random.PRNGKey(2), rgb)),
        "text_encoder": ("clip", CLIPTextModel(CLIPTextConfig.tiny()).init(
            jax.random.PRNGKey(3), toks)),
        "controlnet": ("controlnet", ControlNet(ccfg).init(
            jax.random.PRNGKey(4), sample, t, ctx, cond)),
    }
    try:
        from safetensors.numpy import save_file
    except ImportError:  # pragma: no cover - safetensors is in the image
        save_file = None
    for sub, (mtype, params) in comps.items():
        sd = convert.flax_to_torch_state_dict(params, mtype)
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        if save_file is not None:
            save_file({k: np.asarray(v) for k, v in sd.items()},
                      os.path.join(d, "diffusion_pytorch_model.safetensors"))
        else:
            import torch

            torch.save({k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
                       os.path.join(d, "diffusion_pytorch_model.bin"))
        log(f"fixture: wrote {sub} ({len(sd)} tensors)")


# ---------------------------------------------------------------------------
# stage 1: strict conversion
# ---------------------------------------------------------------------------

def stage_convert(model_dir: str, tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from dreammat_tpu.models.diffusion import convert
    from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
    from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
    from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig

    ucfg = UNetConfig.tiny() if tiny else UNetConfig.sd21()
    vcfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
    tcfg = CLIPTextConfig.tiny() if tiny else CLIPTextConfig.sd21()
    if tiny:
        ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22,
                                conditioning_embedding_channels=(16, 32))
    else:
        ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22)

    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 4, ucfg.cross_attention_dim))
    stem = 2 ** (len(ccfg.conditioning_embedding_channels) - 1)

    defs = {
        "unet": ("unet", lambda: UNet2DCondition(ucfg).init(
            jax.random.PRNGKey(0), sample, t, ctx)),
        "vae": ("vae", lambda: AutoencoderKL(vcfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))),
        "text_encoder": ("clip", lambda: CLIPTextModel(tcfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))),
        "controlnet": ("controlnet", lambda: ControlNet(ccfg).init(
            jax.random.PRNGKey(0), sample, t, ctx,
            jnp.zeros((1, 8 * stem, 8 * stem, 22)))),
    }
    results = {}
    for sub, (mtype, make) in defs.items():
        d = os.path.join(model_dir, sub)
        ckpt = convert.find_checkpoint_file(d) if os.path.isdir(d) else None
        if not ckpt:
            results[sub] = "absent"
            log(f"convert: {sub}: no checkpoint under {d} (skipped)")
            continue
        sd = convert.load_torch_state_dict(ckpt)
        template = convert.fast_random_init(jax.random.PRNGKey(0), make)
        n = len(jax.tree_util.tree_leaves(template))
        convert.torch_to_flax_params(sd, template, mtype, strict=True)
        results[sub] = f"ok:{n}"
        log(f"convert: {sub}: OK — all {n} tensors matched strictly")
    if all(v == "absent" for v in results.values()):
        raise SystemExit(f"no checkpoints found under {model_dir}")
    return results


# ---------------------------------------------------------------------------
# stage runner
# ---------------------------------------------------------------------------

def run_stage(name, cmd, timeout):
    log(f"{name}: {' '.join(cmd)}")
    t0 = time.time()
    p = subprocess.run(cmd, cwd=ROOT, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out = p.stdout.decode(errors="replace")
    dt = time.time() - t0
    if p.returncode != 0:
        print(out[-4000:])
        raise SystemExit(f"stage {name} FAILED (rc={p.returncode})")
    log(f"{name}: PASS ({dt:.0f}s)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None,
                    help="diffusers-layout weights (model/unet, model/vae, "
                    "model/text_encoder, model/controlnet). Omit for the "
                    "hermetic tiny fixture dry run.")
    ap.add_argument("--steps-2d", type=int, default=None,
                    help="playground SDS steps (default 20 fixture / 400 real)")
    ap.add_argument("--e2e-steps", type=int, default=5)
    ap.add_argument("--out", default="outputs/prove_weights")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    hermetic = args.model_dir is None
    env_note = ""
    if hermetic and not os.environ.get("DREAMMAT_PLATFORM"):
        # the tiny fixture chain must not depend on (or wedge against) the
        # TPU tunnel; real-weight runs use whatever backend the image pins
        os.environ["DREAMMAT_PLATFORM"] = "cpu"
        env_note = " (hermetic: forced cpu backend)"
    log(f"mode: {'hermetic tiny fixture' if hermetic else args.model_dir}{env_note}")

    summary = {"mode": "fixture" if hermetic else "real"}
    t_all = time.time()

    if hermetic:
        tmp = tempfile.mkdtemp(prefix="dreammat_fixture_")
        synthesize_fixture(tmp)
        model_dir = tmp
    else:
        model_dir = args.model_dir

    # stage 1 — strict conversion
    summary["convert"] = stage_convert(model_dir, tiny=hermetic)

    # stage 2 — 2D playground through the converted weights
    steps = args.steps_2d or (20 if hermetic else 400)
    out2d = os.path.join(args.out, "2d")
    child_env = dict(os.environ)
    run_stage("2dplay", [
        sys.executable, "playground_2d.py", "--prompt", "a red apple",
        "--steps", str(steps), "--size", "64" if hermetic else "512",
        "--model-size", "tiny" if hermetic else "sd21",
        "--cache-dir", model_dir, "--out", out2d,
    ], timeout=1800 if hermetic else 7200)
    final = os.path.join(out2d, "final.png")
    assert os.path.isfile(final), f"missing {final}"
    summary["playground_final"] = final

    # stage 3 — tiny end-to-end train with the weights wired in
    if not args.skip_e2e:
        run_stage("e2e", [
            sys.executable, "launch.py", "--config",
            "configs/dreammat_tiny.yaml", "--train",
            "system.prompt_processor.prompt=a red apple",
            "system.geometry.shape_init=procedural:sphere",
            f"system.guidance.cache_dir={model_dir}",
            f"trainer.max_steps={args.e2e_steps}",
            "name=prove_weights_e2e",
        ], timeout=3600 if hermetic else 7200)
        summary["e2e"] = "ok"

    summary["wall_s"] = round(time.time() - t_all, 1)
    log("ALL STAGES GREEN")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
