"""Decompose the self-attention path's wall-clock at SD2.1 UNet shapes.

profile_ablate.py attributes 7.4 ms of the batch-3 denoise UNet to the
self-attention subsystem while the swept flash kernel itself accounts for
~4.4 ms — this tool times the path's pieces in isolation on the chip to
locate the remainder:

    module   LayerNorm + QKV proj + flash kernel + out proj (the real path)
    kernel   flash_attention on [B,N,H,D] (includes the _fold/_unfold
             HBM transposes inside _flash_forward)
    fold     the [B,N,H,D] -> [B*H,N,D] moveaxis round-trip alone
    proj     the 4 Dense-sized matmuls alone
    ln       LayerNorm alone

module - (kernel + proj + ln) = fusion/layout overhead XLA failed to hide.

Timing: each piece is shape-preserving, so it is chained through a
``lax.fori_loop`` INSIDE one jit call (the loop carry feeds iteration
i's output into i+1's input — no overlap, nothing drains past the
timer). The in-jit loop exists because the axon tunnel adds ~1 ms of
dispatch latency per python->device call: timing sub-ms ops one call at
a time measures the tunnel, not the op (first version of this tool
returned exactly 1.0 ms for everything — see the round-4 log).

Usage: python tools/profile_attn_path.py [--iters 10] [--inner 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tokens, channels, heads, calls-per-UNet-pass): the three self-attention
# sites of the SD2.1 UNet at 64x64 latents (reference budget:
# dreammat_guidance.py:407 runs this UNet 3x per CSD step)
SHAPES = [
    (4096, 320, 5, 5),
    (1024, 640, 10, 5),
    (256, 1280, 20, 6),
]


def timed_loop(step, x0, iters, inner):
    """Per-application seconds of shape-preserving ``step``, amortized over
    ``inner`` chained in-jit applications (tiny perturbation keeps the
    chain data-dependent without changing the op mix).

    Synchronization is a SCALAR PULL, not jax.block_until_ready: on the
    tunneled axon backend block_until_ready returns without waiting
    (ROADMAP #45) — only pulling a value forces the device work to have
    completed. The pull itself costs ~40 ms of fixed tunnel latency, so
    the per-iteration time is the SLOPE between two trip counts
    (``inner`` and ``5*inner``) of the same compiled dynamic-bound loop —
    every fixed cost (pull, dispatch, loop setup) cancels in the
    difference, and the chain keeps each trip's work un-drainable."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(y, n):
        y = lax.fori_loop(
            0, n, lambda i, y: step(y) * (1.0 + 1e-30 * i), y)
        return jnp.max(jnp.abs(y.astype(jnp.float32)))

    n1, n2 = inner, 5 * inner
    float(loop(x0, n1))  # compile + warm + full drain
    float(loop(x0, n2))

    def run(n):
        t0 = time.perf_counter()
        _ = float(loop(x0, n))  # pull forces completion
        return time.perf_counter() - t0

    reps = max(3, iters // 3)
    t1 = sorted(run(n1) for _ in range(reps))[reps // 2]
    t2 = sorted(run(n2) for _ in range(reps))[reps // 2]
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--batch", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from dreammat_tpu.models.diffusion.layers import Attention, norm_dtype
    from dreammat_tpu.ops.attention import attention as fused_attention

    B = args.batch
    dtype = jnp.bfloat16
    print(f"self-attention path decomposition (batch {B}, bf16, "
          f"{jax.devices()[0].device_kind}, inner={args.inner})\n")
    print("| shape | module | kernel | fold | proj | ln | overhead | x calls |")
    print("|---|---|---|---|---|---|---|---|")

    total_module = total_overhead = 0.0
    for n_tok, ch, heads, calls in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, n_tok, ch), dtype)
        attn = Attention(heads, ch // heads, dtype=dtype)
        params = attn.init(jax.random.PRNGKey(1), x)

        qh = jax.random.normal(key, (B, n_tok, heads, ch // heads), dtype)
        # 1/sqrt(ch) scale keeps the 50-deep chained matmul pile from
        # overflowing bf16 (norm-preserving like the real Dense init)
        w = jax.random.normal(jax.random.PRNGKey(2), (ch, ch), dtype) / ch**0.5
        ln = nn.LayerNorm(epsilon=1e-5, dtype=norm_dtype(dtype))
        ln_params = ln.init(jax.random.PRNGKey(3), x)

        def fold_step(q):
            f = jnp.moveaxis(q, 2, 1)
            return jnp.moveaxis(f, 1, 2)

        def proj_step(h):
            for _ in range(4):
                h = h @ w
            return h

        t_mod = timed_loop(lambda y: attn.apply(params, y), x,
                           args.iters, args.inner) * 1e3
        t_ker = timed_loop(lambda q: fused_attention(q, q, q), qh,
                           args.iters, args.inner) * 1e3
        t_fold = timed_loop(fold_step, qh, args.iters, args.inner) * 1e3
        t_proj = timed_loop(proj_step, x, args.iters, args.inner) * 1e3
        t_ln = timed_loop(lambda y: ln.apply(ln_params, y), x,
                          args.iters, args.inner) * 1e3
        over = t_mod - (t_ker + t_proj + t_ln)
        total_module += t_mod * calls
        total_overhead += max(over, 0.0) * calls
        print(f"| {n_tok}tok c{ch} h{heads} | {t_mod:.3f} | {t_ker:.3f} | "
              f"{t_fold:.3f} | {t_proj:.3f} | {t_ln:.3f} | {over:+.3f} | "
              f"x{calls} |", flush=True)

    print(f"\nper-UNet-pass self-attn module total: {total_module:.2f} ms, "
          f"unexplained overhead: {total_overhead:.2f} ms")


if __name__ == "__main__":
    main()
