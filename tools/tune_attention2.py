"""Round-4 flash-attention block re-sweep with chained-loop timing.

tools/tune_attention.py picked (1024, 512) under a timing method that
could overlap data-independent calls; this sweep chains the kernel
through a ``lax.fori_loop`` (output feeds the next input — strictly
serial) and pulls a scalar, the only reliable drain through the axon
tunnel (ROADMAP #45). Run after the bf16-MXU-operand kernel change to
re-pick the forward defaults. bk == M rows collapse the online softmax
to a single pass (no rescale iterations).

Usage: python tools/tune_attention2.py [--inner 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_attn_path import timed_loop  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dreammat_tpu.ops.attention import _flash_forward

    shapes = [
        ("self64", 3, 4096, 5, 64),
        ("self32", 3, 1024, 10, 64),
    ]
    blocks = [(256, 512), (512, 512), (512, 1024), (1024, 512),
              (1024, 1024), (2048, 512), (1024, 2048), (512, 4096),
              (1024, 4096)]

    print(f"forward block sweep, chained fori timing, bf16-MXU kernel "
          f"({jax.devices()[0].device_kind})\n")
    for label, B, N, H, D in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D),
                              jnp.bfloat16)
        row = [label]
        for bq, bk in blocks:
            if bq > N or bk > N:
                row.append(f"({bq},{bk}): -")
                continue
            try:
                def step(y, bq=bq, bk=bk):
                    return _flash_forward(y, y, y, block_q=bq, block_k=bk)[0]

                ms = timed_loop(step, q, args.iters, args.inner) * 1e3
                row.append(f"({bq},{bk}): {ms:.3f}")
            except Exception as e:
                row.append(f"({bq},{bk}): ERR {str(e)[:40]}")
            print(" | ".join(row[-1:]), flush=True)
        print(f"== {label}: " + " | ".join(row[1:]), flush=True)


if __name__ == "__main__":
    main()
