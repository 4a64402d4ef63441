"""Flash-attention block-size sweep on the SD2.1 UNet's real shapes.

The fwd/bwd kernels default to (block_q=256, block_k=512); this measures
per-(block_q, block_k) wall time for the dominant attention shapes of the
north-star denoise step (self-attn at 64^2/32^2/16^2 latents, cross-attn
vs 77 text tokens, 3-replica CFG batch, bf16) plus the ControlNet-training
backward, and prints a markdown table. Run on the chip; pick winners into
the kernel defaults only if they beat the incumbent by >2% on the hot
shape.

Timing via the slope method (see bench.py: through the remote tunnel a
value pull is the only reliable stream drain).
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, iters=10):
    float(fn())
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        float(out)
        return time.perf_counter() - t0
    run(2)
    n1, n2 = max(2, iters // 4), max(2, iters // 4) + iters
    t1, t2 = run(n1), run(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bwd", action="store_true", help="also sweep backward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dreammat_tpu.ops.attention import _flash_backward, _flash_forward

    # (label, B, N, M, H, D): UNet self/cross shapes for 512^2 images,
    # 3-replica CFG batch; H = channels/64 heads
    shapes = [
        ("self64", 3, 4096, 4096, 5, 64),
        ("self32", 3, 1024, 1024, 10, 64),
        ("self16", 3, 256, 256, 20, 64),
        ("cross64", 3, 4096, 77, 5, 64),
        ("cross32", 3, 1024, 77, 10, 64),
    ]
    blocks = [(128, 512), (256, 256), (256, 512), (256, 1024),
              (512, 512), (512, 1024), (1024, 512)]

    rows = []
    for label, B, N, M, H, D in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, M, H, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, M, H, D), jnp.bfloat16)
        for bq, bk in blocks:
            if bq > N or bk > max(M, 128):
                continue
            try:
                fn = jax.jit(lambda q=q, k=k, v=v, bq=bq, bk=bk: jnp.sum(
                    _flash_forward(q, k, v, block_q=bq, block_k=bk)[0]
                    .astype(jnp.float32)))
                ms = timed(fn, args.iters) * 1e3
            except Exception as e:  # VMEM blowout etc. — record and move on
                rows.append({"shape": label, "bq": bq, "bk": bk,
                             "ms": None, "err": str(e)[:80]})
                continue
            rows.append({"shape": label, "bq": bq, "bk": bk,
                         "ms": round(ms, 3)})
            print(json.dumps(rows[-1]), flush=True)
        # XLA reference for the same shape
        xla = jax.jit(lambda q=q, k=k, v=v: jnp.sum(
            jax.nn.dot_product_attention(q, k, v).astype(jnp.float32)))
        rows.append({"shape": label, "bq": 0, "bk": 0,
                     "ms": round(timed(xla, args.iters) * 1e3, 3),
                     "xla": True})
        print(json.dumps(rows[-1]), flush=True)

    print("\n| shape | block_q | block_k | ms |")
    print("|---|---|---|---|")
    for r in rows:
        tag = "XLA" if r.get("xla") else f"{r['bq']}x{r['bk']}"
        print(f"| {r['shape']} | {tag.split('x')[0] if 'x' in tag else tag} | "
              f"{tag.split('x')[1] if 'x' in tag else ''} | "
              f"{r['ms'] if r['ms'] is not None else r.get('err')} |")


if __name__ == "__main__":
    main()
