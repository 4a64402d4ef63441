"""Primitive costs for the view-static hashgrid backward design (TPU).

All timings use the loop-carried fori slope harness (the axon tunnel caches
value-identical dispatches, so naive repeat timing lies — see
bench_hashgrid.py). N = 20.4M corner updates (160k pts x 8 corners x 16
levels), table = flat [8.4M, 2] (16 levels x 2^19).

  sort_triples     lax.sort of [N] key + 2 fp32 payloads
  cumsum_N         jnp.cumsum over [N, 2]
  gather_N         20M 8-byte row gathers (the backward's permute step)
  gather_T2        2 x 8.4M row gathers (the csum boundary densify)
  scatter_rand     20M random scatter-add (autodiff baseline)
  scatter_uniq     4M unique+sorted scatter-add (compact-update floor)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(run, lo=2, hi=8):
    import jax

    jax.block_until_ready(run(lo))
    jax.block_until_ready(run(hi))
    t0 = time.perf_counter()
    jax.block_until_ready(run(lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    N = 160_000 * 8 * 16
    TT = (1 << 19) * 16
    rng = np.random.RandomState(0)
    keys0 = jnp.asarray(rng.randint(0, TT, size=N), jnp.int32)
    vals0 = jnp.asarray(rng.rand(N, 2).astype(np.float32))
    table0 = jnp.zeros((TT, 2), jnp.float32)
    uniq_keys = jnp.arange(0, TT, 2, dtype=jnp.int32)  # 4.2M unique+sorted
    uniq_vals = jnp.asarray(rng.rand(uniq_keys.shape[0], 2).astype(np.float32))

    def bench(name, body, carry0):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(n):
            return jax.lax.fori_loop(0, n, body, carry0)

        print(json.dumps({"op": name, "ms_per_iter": round(slope_ms(run), 1)}),
              flush=True)

    # sort: key + 2 payloads; vary keys with i to defeat relay caching
    def sort_body(i, carry):
        k, v0, v1 = jax.lax.sort(
            [keys0 ^ i, vals0[:, 0] + carry[0], vals0[:, 1]], num_keys=1
        )
        return carry + jnp.stack([v0[0], k.astype(jnp.float32)[0] * 1e-9])

    bench("sort_triples", sort_body, jnp.zeros((2,)))

    def cumsum_body(i, carry):
        c = jnp.cumsum(vals0 + carry[0] * 1e-9, axis=0)
        return carry + c[-1] * 1e-9 + i * 0.0

    bench("cumsum_N", cumsum_body, jnp.zeros((2,)))

    def gather_body(i, carry):
        idx = (keys0 ^ i) % N
        g = vals0[idx]
        return carry + g[0] * 1e-9

    bench("gather_N", gather_body, jnp.zeros((2,)))

    def gather_t2_body(i, carry):
        idx = (jnp.arange(TT, dtype=jnp.int32) * 3 + i) % N
        a = vals0[idx]
        b = vals0[(idx + 7) % N]
        return carry + (a[0] - b[0]) * 1e-9

    bench("gather_T2", gather_t2_body, jnp.zeros((2,)))

    def scat_rand_body(i, t):
        return t.at[(keys0 ^ i) % TT].add(vals0)

    bench("scatter_rand", scat_rand_body, table0)

    def scat_uniq_body(i, t):
        return t.at[uniq_keys].add(
            uniq_vals + i * 0.0, indices_are_sorted=True, unique_indices=True
        )

    bench("scatter_uniq", scat_uniq_body, table0)


if __name__ == "__main__":
    main()
