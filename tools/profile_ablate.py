"""Subsystem-level attribution of the denoise step's wall-clock.

profile_denoise.py splits the step into VAE / ControlNet / UNet phases;
this tool goes one level deeper: it re-traces the UNet (and optionally the
ControlNet) with one subsystem at a time replaced by identity
(DREAMMAT_ABLATE, see models/diffusion/layers.py::_ablated) and reports

    dt(baseline) - dt(ablated)  — wall-clock attributed to the subsystem
    dflop                        — XLA cost-analysis FLOPs removed with it
    implied TFLOP/s              — dflop/dt: how efficiently that
                                   subsystem's FLOPs actually ran

A subsystem whose dt share is far above its FLOP share is bandwidth- or
latency-bound — that is where kernel work pays. (Ablations change the
math; they exist only for attribution, never for training.)

Usage: python tools/profile_ablate.py [--iters 20] [--controlnet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_denoise import V5E_PEAK_TFLOPS, flops_of, timed  # noqa: E402

ABLATIONS = ["selfattn", "crossattn", "ff", "tx", "norm", "resconv"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--controlnet", action="store_true",
                    help="profile the ControlNet instead of the UNet")
    ap.add_argument("--ablate", nargs="+", default=ABLATIONS)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny UNet at 16^2 latents (CPU smoke test)")
    ap.add_argument("--platform", default=None, choices=["cpu", "axon", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform:
        # env JAX_PLATFORMS is overridden by the axon sitecustomize; the
        # config route (what tests/conftest.py uses) wins
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from dreammat_tpu.models.diffusion.controlnet import (
        ControlNet, ControlNetConfig,
    )
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig

    dtype = jnp.bfloat16
    ucfg = UNetConfig.tiny() if args.tiny else UNetConfig.sd21()
    lat = 16 if args.tiny else 64
    sample = jnp.zeros((3, lat, lat, 4))
    t3 = jnp.zeros((3,))
    ctx = jnp.zeros((3, 77, ucfg.cross_attention_dim))
    cond1 = jnp.full((1, 8 * lat, 8 * lat, 22), 0.5)

    def zeros_like_tree(shapes):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    # params are initialized PER ablation config: the removed modules'
    # params must be absent from the dict (flax apply with superfluous
    # param subtrees misbehaves), and eval_shape-zeros init is cheap
    if args.controlnet:
        ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22)

        def measure(tag):
            m = ControlNet(ccfg, dtype=dtype)
            params = zeros_like_tree(jax.eval_shape(
                lambda: m.init(jax.random.PRNGKey(0), sample, t3, ctx, cond1)))

            @jax.jit
            def fn(p, x, t, c, img):
                down, mid = m.apply(p, x, t, c, img, 1.0)
                return sum(jnp.sum(d.astype(jnp.float32)) for d in down) \
                    + jnp.sum(mid.astype(jnp.float32))

            fargs = (params, sample, t3, ctx, cond1)
            return timed(fn, fargs, args.iters, chain_idx=1), flops_of(fn, *fargs)
    else:

        def measure(tag):
            m = UNet2DCondition(ucfg, dtype=dtype)
            params = zeros_like_tree(jax.eval_shape(
                lambda: m.init(jax.random.PRNGKey(0), sample, t3, ctx)))

            @jax.jit
            def fn(p, x, t, c):
                return jnp.sum(m.apply(p, x, t, c).astype(jnp.float32))

            fargs = (params, sample, t3, ctx)
            return timed(fn, fargs, args.iters, chain_idx=1), flops_of(fn, *fargs)

    name = "controlnet" if args.controlnet else "unet"
    rows = {}
    os.environ.pop("DREAMMAT_ABLATE", None)

    base_dt, base_fl = measure("baseline")
    rows["baseline"] = {"ms": round(base_dt * 1e3, 2),
                        "tflop": round(base_fl / 1e12, 3),
                        "mfu": round(base_fl / 1e12 / base_dt / V5E_PEAK_TFLOPS, 3)}
    print(f"\n{name} subsystem attribution (batch-3 bf16, "
          f"baseline {base_dt*1e3:.2f} ms, "
          f"{base_fl/1e12:.3f} TFLOP, MFU {rows['baseline']['mfu']*100:.0f}%)\n")
    print("| ablation | ms | d_ms | d_TFLOP | subsystem TFLOP/s | share of time |")
    print("|---|---|---|---|---|---|")
    for tag in args.ablate:
        os.environ["DREAMMAT_ABLATE"] = tag
        try:
            dt, fl = measure(tag)
        finally:
            os.environ.pop("DREAMMAT_ABLATE", None)
        d_ms = (base_dt - dt) * 1e3
        d_tf = (base_fl - fl) / 1e12
        tfs = d_tf / (d_ms / 1e3) if d_ms > 1e-6 else float("nan")
        rows[tag] = {"ms": round(dt * 1e3, 2), "d_ms": round(d_ms, 2),
                     "d_tflop": round(d_tf, 3),
                     "share": round(d_ms / (base_dt * 1e3), 3)}
        print(f"| -{tag} | {dt*1e3:.2f} | {d_ms:.2f} | {d_tf:.3f} | "
              f"{tfs:.1f} | {d_ms/(base_dt*1e3)*100:.1f}% |")
    print()
    print(json.dumps({"model": name, **rows}))


if __name__ == "__main__":
    main()
