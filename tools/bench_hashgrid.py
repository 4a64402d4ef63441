"""Microbench the real hashgrid_encode fwd/vjp + candidate rewrites on TPU.

MEASUREMENT NOTE: the axon tunnel can serve value-identical re-dispatches
from a cache, so naive repeat-the-same-call timing lies. Every benchmark
here runs its iterations INSIDE one jit via lax.fori_loop with a
loop-carried dependency (table updated from the grad each step), and the
per-iter cost is the slope between two iteration counts — immune to both
the dispatch cache and fixed tunnel overhead.

profile_step measured the field backward at ~931 ms/step inside the real
train step; this isolates where that goes and evaluates rewrites:

  enc_grad        jax.grad of the current hashgrid_encode (autodiff scatter)
  enc2_grad       custom-vjp variant: one flat scatter-add per level
  enc3_grad       custom-vjp + sort_key_val before the scatter
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(run, lo=2, hi=12):
    """run(n) -> a blockable pytree; returns per-iter ms via two-point fit."""
    import jax

    jax.block_until_ready(run(lo))  # compile both grids
    jax.block_until_ready(run(hi))
    t0 = time.perf_counter()
    jax.block_until_ready(run(lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo) * 1e3


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreammat_tpu.ops import hashgrid as hg

    cfg = hg.HashGridConfig()
    P = 160_000
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(P, 3), jnp.float32)
    table0 = hg.init_hashgrid(jax.random.PRNGKey(0), cfg)
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features_per_level

    def bench_grad(enc_fn, name):
        loss = lambda t, x: jnp.sum(enc_fn(t, x) ** 2)
        gfn = jax.grad(loss)

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(n):
            def body(i, t):
                g = gfn(t, pts + i * 1e-6)
                return t - 1e-6 * g

            return jax.lax.fori_loop(0, n, body, table0)

        print(json.dumps({"op": name, "ms_per_iter": round(slope_ms(run), 1)}),
              flush=True)

    def bench_fwd(enc_fn, name):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(n):
            def body(i, carry):
                out = enc_fn(table0, pts + carry[0:1, 0:1] * 1e-9 + i * 1e-6)
                return carry + out[:1]

            return jax.lax.fori_loop(0, n, body, jnp.zeros((1, cfg.n_output_dims)))

        print(json.dumps({"op": name, "ms_per_iter": round(slope_ms(run), 1)}),
              flush=True)

    enc1 = lambda t, x: hg.hashgrid_encode(t, x, cfg)
    bench_fwd(enc1, "enc_fwd")
    bench_grad(enc1, "enc_grad")

    # ---- variant 2: custom vjp, one flat scatter per level --------------
    D, C = 3, 8
    offs = jnp.asarray(
        np.stack([[(c >> d) & 1 for d in range(D)] for c in range(C)]).astype(np.float32)
    )
    resolutions = cfg.level_resolutions()

    def corners_and_weights(x):
        idxs, ws = [], []
        for lvl in range(L):
            res = int(resolutions[lvl])
            xs = x * res
            x0 = jnp.floor(xs)
            w = xs - x0
            corners = jnp.clip(x0[:, None, :] + offs[None, :, :], 0, res).astype(jnp.int32)
            dense = (res + 1) ** D <= T
            idx = (hg._dense_index(corners, res, T) if dense
                   else hg._hash_corners(corners, T))
            wc = jnp.ones((x.shape[0], C), jnp.float32)
            for d in range(D):
                bit = offs[None, :, d]
                wc = wc * (bit * w[:, d : d + 1] + (1 - bit) * (1 - w[:, d : d + 1]))
            idxs.append(idx)
            ws.append(wc)
        return jnp.stack(idxs), jnp.stack(ws)  # [L,P,C] each

    def make_enc(bwd_kind):
        @jax.custom_vjp
        def enc(table, x):
            idx, wc = corners_and_weights(x)
            feats = jax.vmap(lambda t, i: t[i.reshape(-1)].reshape(-1, C, F))(table, idx)
            return jnp.moveaxis(jnp.sum(feats * wc[..., None], axis=2), 0, 1).reshape(
                x.shape[0], L * F
            )

        def fwd(table, x):
            return enc(table, x), (x,)

        def bwd(res, gout):
            (x,) = res
            idx, wc = corners_and_weights(x)
            gl = jnp.moveaxis(gout.reshape(-1, L, F), 1, 0)  # [L,P,F]
            upd = (wc[..., None] * gl[:, :, None, :]).reshape(L, -1, F)
            flat = idx.reshape(L, -1)
            if bwd_kind == "scatter":
                def one(i, u):
                    return jnp.zeros((T, F)).at[i].add(u)
            else:  # sort first
                def one(i, u):
                    i_s, u0, u1 = jax.lax.sort([i, u[:, 0], u[:, 1]], num_keys=1)
                    return jnp.zeros((T, F)).at[i_s].add(
                        jnp.stack([u0, u1], -1), indices_are_sorted=True
                    )
            return jax.vmap(one)(flat, upd), None

        enc.defvjp(fwd, bwd)
        return enc

    enc2 = make_enc("scatter")
    bench_grad(enc2, "enc2_grad_flat_scatter")
    enc3 = make_enc("sort")
    bench_grad(enc3, "enc3_grad_sorted_scatter")

    # sanity: enc2 grads match autodiff
    g1 = jax.grad(lambda t: jnp.sum(enc1(t, pts) ** 2))(table0)
    g2 = jax.grad(lambda t: jnp.sum(enc2(t, pts) ** 2))(table0)
    print("grad maxdiff:", float(jnp.abs(g1 - g2).max()), flush=True)


if __name__ == "__main__":
    main()
