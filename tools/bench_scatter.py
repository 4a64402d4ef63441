"""Microbench: hashgrid gather/scatter strategies on real TPU.

The train-step profile (tools/profile_step.py) shows the field backward —
a scatter-add of P*8 corner updates per level into [L, 2^19, F] hash
tables — dominating the whole step. This measures the candidate
implementations at flagship shapes to pick the rebuild:

  gather_fwd        t[idx] baseline (what hashgrid_encode does today)
  scatter_add       .at[idx].add(updates) baseline (XLA default lowering)
  sort_segment      sort_key_val + boundary-diff cumsum + unique/sorted scatter
  onehot_matmul     one-hot MXU contraction per 8k-row table tile (dense levels)

Shapes: N = 160k points * 8 corners per level; all 16 levels batched by
offsetting keys into one [L*T] flat table (one sort instead of 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    L, T, F = 16, 1 << 19, 2
    P = 160_000
    N = P * 8  # corner updates per level
    rng = np.random.RandomState(0)
    # per-level indices; realistic: spatially-coherent-ish but treat as random
    idx = jnp.asarray(rng.randint(0, T, size=(L, N)), jnp.int32)
    upd = jnp.asarray(rng.rand(L, N, F), jnp.float32)
    table = jnp.zeros((L, T, F), jnp.float32)

    # --- gather forward baseline --------------------------------------
    @jax.jit
    def gather_fwd(table, idx):
        return jax.vmap(lambda t, i: t[i])(table, idx)

    print(json.dumps({"op": "gather_fwd", "ms": round(timed(gather_fwd, table, idx), 1)}), flush=True)

    # --- scatter-add baseline ------------------------------------------
    @jax.jit
    def scatter_add(table, idx, upd):
        return jax.vmap(lambda t, i, u: t.at[i].add(u))(table, idx, upd)

    print(json.dumps({"op": "scatter_add", "ms": round(timed(scatter_add, table, idx, upd), 1)}), flush=True)

    # --- sort, then scatter with the sorted hint -------------------------
    @jax.jit
    def sort_then_scatter(idx, upd):
        # flatten all levels into one key space [L*T)
        lvl = jnp.arange(L, dtype=jnp.int32)[:, None]
        keys = (idx + lvl * T).reshape(-1)              # [L*N]
        vals = upd.reshape(-1, F)                        # [L*N, F]
        keys_s, v0, v1 = jax.lax.sort([keys, vals[:, 0], vals[:, 1]], num_keys=1)
        vals_s = jnp.stack([v0, v1], axis=-1)
        out = jnp.zeros((L * T, F))
        out = out.at[keys_s].add(vals_s, indices_are_sorted=True)
        return out.reshape(L, T, F)

    print(json.dumps({"op": "sort_then_scatter", "ms": round(timed(sort_then_scatter, idx, upd), 1)}), flush=True)

    # --- sort + segment-boundary diff + unique scatter -------------------
    @jax.jit
    def sort_segment_unique(idx, upd):
        lvl = jnp.arange(L, dtype=jnp.int32)[:, None]
        keys = (idx + lvl * T).reshape(-1)
        vals = upd.reshape(-1, F)
        keys_s, v0, v1 = jax.lax.sort([keys, vals[:, 0], vals[:, 1]], num_keys=1)
        vals_s = jnp.stack([v0, v1], axis=-1)
        csum = jnp.cumsum(vals_s, axis=0)
        is_end = jnp.concatenate([keys_s[1:] != keys_s[:-1], jnp.asarray([True])])
        # per segment: csum at its end minus csum at previous segment's end ==
        # scatter +csum[end] to key, -csum[end] to the NEXT segment's key
        out = jnp.zeros((L * T + 1, F))
        pos_keys = jnp.where(is_end, keys_s, L * T)
        out = out.at[pos_keys].add(jnp.where(is_end[:, None], csum, 0.0))
        nxt_keys = jnp.concatenate([keys_s[1:], jnp.asarray([L * T], jnp.int32)])
        neg_keys = jnp.where(is_end, nxt_keys, L * T)
        out = out.at[neg_keys].add(jnp.where(is_end[:, None], -csum, 0.0))
        return out[:-1].reshape(L, T, F)

    print(json.dumps({"op": "sort_segment_unique", "ms": round(timed(sort_segment_unique, idx, upd), 1)}), flush=True)

    # --- plain scatter but flat (one scatter for all levels) ------------
    @jax.jit
    def scatter_flat(idx, upd):
        lvl = jnp.arange(L, dtype=jnp.int32)[:, None]
        keys = (idx + lvl * T).reshape(-1)
        vals = upd.reshape(-1, F)
        out = jnp.zeros((L * T, F))
        return out.at[keys].add(vals).reshape(L, T, F)

    print(json.dumps({"op": "scatter_flat", "ms": round(timed(scatter_flat, idx, upd), 1)}), flush=True)

    # --- one-hot matmul over table tiles (MXU) — dense-level strategy ---
    TILE = 4096

    @jax.jit
    def onehot_tile(idx1, upd1):
        # single level, table tiled: sum_j onehot(idx==tile_row) @ upd
        def tile_sum(t0):
            m = (idx1[:, None] - t0 == jnp.arange(TILE)[None, :]).astype(jnp.float32)
            return jax.lax.dot_general(m, upd1, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        t0s = jnp.arange(0, T, TILE)
        return jax.lax.map(tile_sum, t0s)

    # one level only — extrapolate x16
    print(json.dumps({"op": "onehot_tile_1lvl", "ms": round(timed(onehot_tile, idx[0], upd[0]), 1)}), flush=True)


if __name__ == "__main__":
    main()
