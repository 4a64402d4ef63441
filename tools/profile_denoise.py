"""MFU / phase breakdown of the north-star CSD denoise step on hardware.

Decomposes the bench.py step (1 VAE encode 512^2 -> 64^2 + 3x ControlNet +
3x UNet at 64^2 latents, bf16, SD2.1 scale) into separately jitted phases,
times each warm, pulls XLA's flop estimate per phase (compiled
cost_analysis) and reports achieved TFLOP/s and MFU against the v5e peak.

Usage:  python tools/profile_denoise.py [--iters 20] [--attn pallas|xla]
Prints a markdown table + one JSON line.

Timing method: through the remote-device tunnel `block_until_ready` does
not reliably block (dispatch is acked before compute finishes), so naive
loops measure dispatch rate. Each phase is therefore timed as one long
CHAINED run: step i+1's input carries a (numerically invisible) dependency
on step i's scalar output, so the single final value pull cannot return
before every step's device work is done — no work can drain past the
timer (the round-3 failure mode). Median of 3 runs rejects the rare ~0.9 s
tunnel stalls. A per-phase self-check asserts implied MFU <= 100%.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS = 197.0  # bf16 peak per chip (TPU v5e)


def timed(fn, args, iters, chain_idx):
    """Chained-run per-iteration seconds (see module docstring).

    ``chain_idx``: which positional arg is an array the carry perturbs
    (adds carry*1e-30 — numerically invisible, not constant-foldable)."""
    import jax

    @jax.jit
    def chained(carry, *a):
        a = list(a)
        a[chain_idx] = a[chain_idx] + carry * 1e-30
        return fn(*a)

    import jax.numpy as jnp

    zero = jnp.zeros(())
    float(chained(zero, *args))  # compile + warm

    def run(n):
        carry = zero
        t0 = time.perf_counter()
        for _ in range(n):
            carry = chained(carry, *args)
        float(carry)  # pull forces ALL chained steps to have completed
        return time.perf_counter() - t0

    n = max(10, iters)
    run(2)  # absorb any lazy second-call work
    times = sorted(run(n) for _ in range(3))
    return times[1] / n


def flops_of(jfn, *args):
    import jax

    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--attn", choices=["pallas", "xla"], default=None)
    args = ap.parse_args()
    if args.attn:
        os.environ["DREAMMAT_ATTN"] = args.attn

    import jax
    import jax.numpy as jnp

    from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
    from dreammat_tpu.models.diffusion.scheduler import (
        SchedulerConfig, add_noise, make_schedule,
    )
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
    from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig

    dtype = jnp.bfloat16
    ucfg, vcfg = UNetConfig.sd21(), VAEConfig.sd()
    ccfg = ControlNetConfig(unet=ucfg, conditioning_channels=22)
    unet = UNet2DCondition(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    cnet = ControlNet(ccfg, dtype=dtype)
    H, lat = 512, 64
    sched = make_schedule(SchedulerConfig())

    sample = jnp.zeros((3, lat, lat, 4))
    t0_ = jnp.zeros((3,))
    ctx = jnp.zeros((3, 77, 1024))
    cond = jnp.zeros((3, H, H, 22))
    rgb = jnp.zeros((1, H, H, 3))

    def zeros_like_tree(shapes):
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    up = zeros_like_tree(jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), sample, t0_, ctx)))
    vp = zeros_like_tree(jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), rgb)))
    cp = zeros_like_tree(jax.eval_shape(lambda: cnet.init(jax.random.PRNGKey(0), sample, t0_, ctx, cond)))

    # each phase reduces to a scalar: block_until_ready on large pytree
    # outputs under-measures through the device tunnel (async dispatch),
    # a scalar reduction forces true completion like full_step
    @jax.jit
    def vae_encode(vp, rgb, rng):
        return jnp.sum(vae.apply(vp, rgb * 2 - 1, rng, method=vae.encode).astype(jnp.float32))

    @jax.jit
    def cnet_fwd(cp, lat3, t3, ctx, c3):
        down, mid = cnet.apply(cp, lat3, t3, ctx, c3, 1.0)
        return sum(jnp.sum(d) for d in down) + jnp.sum(mid)

    @jax.jit
    def unet_fwd(up, lat3, t3, ctx, down, mid):
        return jnp.sum(unet.apply(up, lat3, t3, ctx,
                       down_block_additional_residuals=down,
                       mid_block_additional_residual=mid))

    @jax.jit
    def cnet_raw(cp, lat3, t3, ctx, c3):
        return cnet.apply(cp, lat3, t3, ctx, c3, 1.0)

    @jax.jit
    def full_step(up, vp, cp, rgb, cond1, ctx, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        latents = vae.apply(vp, rgb * 2 - 1, k1, method=vae.encode).astype(jnp.float32)
        tt = jax.random.randint(k2, (1,), 20, 980)
        noise = jax.random.normal(k3, latents.shape)
        noisy = add_noise(sched, latents, noise, tt)
        lat3 = jnp.concatenate([noisy] * 3, axis=0)
        t3 = jnp.concatenate([tt] * 3, axis=0)
        # batch-1 cond: the 512^2 conditioning stem runs once and its
        # latent-res output broadcasts over the CFG replicas (bench.py /
        # guidance.noise_pred semantics)
        down, mid = cnet.apply(cp, lat3, t3, ctx, cond1, 1.0)
        eps = unet.apply(up, lat3, t3, ctx,
                         down_block_additional_residuals=down,
                         mid_block_additional_residual=mid)
        return jnp.sum(eps)

    rgb_in = jnp.full((1, H, H, 3), 0.5)
    cond1 = jnp.full((1, H, H, 22), 0.5)
    rng = jax.random.PRNGKey(0)

    lat3 = jnp.zeros((3, lat, lat, 4))
    t3 = jnp.zeros((3,))
    down, mid = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: cnet_raw(cp, lat3, t3, ctx, cond1)),
    )

    phases = {}
    phases["vae_encode"] = (
        timed(vae_encode, (vp, rgb_in, rng), args.iters, chain_idx=1),
        flops_of(vae_encode, vp, rgb_in, rng),
    )
    phases["controlnet_x3"] = (
        timed(cnet_fwd, (cp, lat3, t3, ctx, cond1), args.iters, chain_idx=1),
        flops_of(cnet_fwd, cp, lat3, t3, ctx, cond1),
    )
    phases["unet_x3"] = (
        timed(unet_fwd, (up, lat3, t3, ctx, down, mid), args.iters, chain_idx=1),
        flops_of(unet_fwd, up, lat3, t3, ctx, down, mid),
    )
    phases["full_step"] = (
        timed(full_step, (up, vp, cp, rgb_in, cond1, ctx, rng), args.iters,
              chain_idx=3),
        flops_of(full_step, up, vp, cp, rgb_in, cond1, ctx, rng),
    )

    attn = os.environ.get("DREAMMAT_ATTN", "auto")
    print(f"\nDenoise-step phase breakdown (attn={attn}, backend="
          f"{jax.default_backend()}, iters={args.iters})\n")
    print("| phase | ms | TFLOP | TFLOP/s | MFU |")
    print("|---|---|---|---|---|")
    rows = {}
    for name, (dt, fl) in phases.items():
        tf = fl / 1e12
        tfs = tf / dt if dt > 0 else float("nan")
        mfu = tfs / V5E_PEAK_TFLOPS
        rows[name] = {"ms": round(dt * 1e3, 2), "tflop": round(tf, 3),
                      "tflops": round(tfs, 1), "mfu": round(mfu, 4)}
        print(f"| {name} | {dt*1e3:.2f} | {tf:.3f} | {tfs:.1f} | {mfu*100:.1f}% |")
        if mfu > 1.0:
            print(f"SELF-CHECK FAILED: phase {name} implies "
                  f"{mfu*100:.0f}% MFU (> 100% is physically impossible) — "
                  f"timing leaked device work past the timer.", file=sys.stderr)
            sys.exit(1)
    sps = 1.0 / phases["full_step"][0]
    print(f"\nfull step: {sps:.2f} steps/s")
    print(json.dumps({"attn": attn, "steps_per_sec": round(sps, 3), **rows}))


if __name__ == "__main__":
    main()
