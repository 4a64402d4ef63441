"""Multiresolution hash-grid encoding (instant-ngp style), pure JAX.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding used by the
reference (/root/reference/threestudio_dreammat/threestudio/models/
networks.py:55-64 via cfg at configs/dreammat.yaml:43-49). The table
lookup is a batched gather + d-linear interpolation; XLA fuses the corner
arithmetic, and the gathers dominate — they run on the VPU out of HBM/VMEM.
The per-level loop is unrolled at trace time (L=16 levels), so the whole
encode compiles to one fused region feeding the downstream MXU matmuls.

Supports 2D and 3D inputs (reference n_input_dims: 3 for xyz, 2 for uv).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_input_dims: int = 3
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.447269237440378

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> np.ndarray:
        return np.floor(
            self.base_resolution * self.per_level_scale ** np.arange(self.n_levels)
        ).astype(np.int64)


def init_hashgrid(rng: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """Table init U(-1e-4, 1e-4) (tcnn default). Shape [L, T, F]."""
    return jax.random.uniform(
        rng,
        (cfg.n_levels, cfg.table_size, cfg.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _hash_corners(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer corner coords [..., D] -> [...] index.

    x enters ADDITIVELY (h = (y*p2 ^ z*p3 + x) mod T) instead of tcnn's
    x*1 XOR: consecutive-x corners then land in consecutive table rows, so
    the encode fetches each cell's (x0, x0+1) corner pair as ONE 2-row
    gather — half the gather rows, the dominant cost of the encode on TPU
    (gathers are ~per-row, tools/bench_scatter2.py). Same distribution
    quality; deviates from tiny-cuda-nn's exact hash (networks.py:55-64),
    which only matters for bit-compat with tcnn checkpoints (none exist
    for this framework's learnable tables)."""
    h = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for d in range(1, coords.shape[-1]):
        h = h ^ (coords[..., d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d]))
    h = h + coords[..., 0].astype(jnp.uint32)
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _dense_index(coords: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Row-major index for levels whose dense grid fits in the table."""
    D = coords.shape[-1]
    idx = coords[..., 0].astype(jnp.uint32)
    stride = 1
    for d in range(1, D):
        stride *= res + 1
        idx = idx + coords[..., d].astype(jnp.uint32) * jnp.uint32(stride)
    return (idx % jnp.uint32(table_size)).astype(jnp.int32)


def _slab_gather(table_lvl: jnp.ndarray, idx_even: jnp.ndarray) -> jnp.ndarray:
    """Fetch corner PAIRS: rows (i, i+1) of [T, F] for each i in idx_even
    [P, C/2] -> [P, C, F] in corner order (x-bit fastest). The x-additive
    hash / row-major dense index guarantee the odd-x corner sits at i+1
    (mod T — the table is padded with a copy of row 0 for the wrap).

    Implemented as two single-row gathers: the fused slice_sizes=(2, F)
    ``lax.gather`` is semantically identical but FAULTS the TPU worker on
    the axon backend (async device crash surfacing at the next host pull;
    bisected 2026-08-17) — do not reintroduce it without re-testing on
    hardware. Consecutive-row pairs still help: the odd-corner gather hits
    the cache line the even-corner gather just pulled."""
    T, F = table_lvl.shape
    padded = jnp.concatenate([table_lvl, table_lvl[:1]], axis=0)  # row T == row 0
    f0 = padded[idx_even]      # [P, C/2, F]
    f1 = padded[idx_even + 1]
    P = idx_even.shape[0]
    return jnp.stack([f0, f1], axis=2).reshape(P, -1, F)


@functools.partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(table: jnp.ndarray, points: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """Encode points in [0,1]^D -> [..., L*F] features."""
    D = cfg.n_input_dims
    orig_shape = points.shape[:-1]
    x = points.reshape(-1, D).astype(jnp.float32)
    idxs, ws = _corners_weights(x, cfg)
    outs = []
    for lvl in range(cfg.n_levels):
        feats = _slab_gather(table[lvl], idxs[lvl][:, 0::2])  # [P, C, F]
        outs.append(jnp.sum(feats * ws[lvl][..., None], axis=1))  # [P, F]
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(*orig_shape, cfg.n_output_dims)


# ---------------------------------------------------------------------------
# View-static encode: scatter-free backward for fixed query points.
#
# DreamMat's per-step field queries hit FIXED surface points (the G-buffers
# are precomputed per camera; reference raytracing_renderer.py:177-181 feeds
# the same positions every step). On TPU the autodiff backward of the table
# gather is a 20M-row scatter-add that XLA lowers at ~70 ns/row (~930 ms —
# measured, tools/bench_hashgrid.py), dominating the whole train step. With
# fixed points the sort of (corner-index -> update-slot) is a per-view
# CONSTANT, so the backward becomes pure streaming work with NO scatter:
#
#   upd        = w * dL/dfeat          elementwise            [P*C, F]
#   upd_sorted = upd[perm]             one gather   (~5 ns/row)
#   csum       = cumsum(upd_sorted)    memory-linear
#   grad[rows] = csum[pos[r+1]]-csum[pos[r]]   one gather of used rows
#
# measured end-to-end: 931 ms -> ~65 ms for the same gradients (bitwise-
# close; fp32 cumsum cancellation bounded by per-level restart, verified in
# tests/test_hashgrid_static.py).
# ---------------------------------------------------------------------------


class EncodeMaps(NamedTuple):
    """Per-(view, query) constants for the scatter-free backward.

    x:    [P, D] normalized points in [0,1]^D (fixed for the view)
    perm: [L*P*C] int32 — flat update-slot ids (l*P*C + p*C + c), ordered by
          (level, corner table row); gathering upd.flat by perm yields the
          update stream sorted by destination row
    pos:  [sum_l rows_l + L] int32 — for each level's used table rows, the
          start offset of its segment in that level's sorted stream, with a
          trailing end sentinel per level (segments are contiguous)
    """

    x: jnp.ndarray
    perm: jnp.ndarray
    pos: jnp.ndarray


def _level_rows(cfg: HashGridConfig) -> Tuple[int, ...]:
    """Used table rows per level (dense size when it fits, else table_size)."""
    out = []
    for res in cfg.level_resolutions():
        dense = (int(res) + 1) ** cfg.n_input_dims
        out.append(dense if dense <= cfg.table_size else cfg.table_size)
    return tuple(out)


def _corners_weights(x: jnp.ndarray, cfg: HashGridConfig):
    """[P,D] -> per-level (idx [P,C] int32, wc [P,C] f32). Pure VPU math —
    recomputed every step (cheap); only the sort order is precomputed."""
    D = cfg.n_input_dims
    P = x.shape[0]
    C = 1 << D
    offs = jnp.asarray(
        np.stack([[(c >> d) & 1 for d in range(D)] for c in range(C)]).astype(np.float32)
    )
    idxs, ws = [], []
    for res in cfg.level_resolutions():
        res = int(res)
        xs = x * res
        x0 = jnp.floor(xs)
        w = xs - x0
        corners = jnp.clip(x0[:, None, :] + offs[None, :, :], 0, res).astype(jnp.int32)
        if (res + 1) ** D <= cfg.table_size:
            idx = _dense_index(corners, res, cfg.table_size)
        else:
            idx = _hash_corners(corners, cfg.table_size)
        wc = jnp.ones((P, C), dtype=jnp.float32)
        for d in range(D):
            bit = offs[None, :, d]
            wc = wc * (bit * w[:, d : d + 1] + (1 - bit) * (1 - w[:, d : d + 1]))
        idxs.append(idx)
        ws.append(wc)
    return idxs, ws


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_encode_maps(x: jnp.ndarray, cfg: HashGridConfig) -> EncodeMaps:
    """One-time (per view) sort of the corner updates by destination table
    row. Jitted: unjitted this is ~5 eager dispatches x L levels, and on the
    axon-tunneled backend per-dispatch latency made the per-view build cost
    ~16 s (313 s for 19 flagship views, measured r2); one fused executable
    brings it to ~the device time of the sorts themselves."""
    x = x.reshape(-1, cfg.n_input_dims).astype(jnp.float32)
    P = x.shape[0]
    C = 1 << cfg.n_input_dims
    idxs, _ = _corners_weights(x, cfg)
    rows = _level_rows(cfg)
    perms, poss = [], []
    for lvl in range(cfg.n_levels):
        keys = idxs[lvl].reshape(-1)  # [P*C]
        order = jnp.argsort(keys)
        keys_s = keys[order]
        perms.append(order.astype(jnp.int32) + lvl * P * C)
        # segment starts for every used row + end sentinel
        starts = jnp.searchsorted(keys_s, jnp.arange(rows[lvl], dtype=jnp.int32))
        poss.append(jnp.concatenate([starts.astype(jnp.int32),
                                     jnp.asarray([P * C], jnp.int32)]))
    return EncodeMaps(x=x, perm=jnp.concatenate(perms), pos=jnp.concatenate(poss))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_static(table: jnp.ndarray, maps: EncodeMaps, cfg: HashGridConfig):
    """Same output as ``hashgrid_encode(table, maps.x, cfg)`` but with the
    scatter-free backward. Gradient flows to ``table`` only (the points are
    view constants)."""
    return _static_fwd_impl(table, maps, cfg)


def _static_fwd_impl(table, maps, cfg):
    idxs, ws = _corners_weights(maps.x, cfg)
    outs = []
    for lvl in range(cfg.n_levels):
        feats = _slab_gather(table[lvl], idxs[lvl][:, 0::2])  # [P, C, F]
        outs.append(jnp.sum(feats * ws[lvl][..., None], axis=1))
    return jnp.concatenate(outs, axis=-1)


def _static_fwd(table, maps, cfg):
    return _static_fwd_impl(table, maps, cfg), (table, maps)


def _static_bwd(cfg, res, gout):
    table, maps = res
    P = maps.x.shape[0]
    C = 1 << cfg.n_input_dims
    F = cfg.n_features_per_level
    L = cfg.n_levels
    T = cfg.table_size
    rows = _level_rows(cfg)
    _, ws = _corners_weights(maps.x, cfg)

    # update stream: upd[l, p, c] = wc[l][p,c] * gout[p, l*F:(l+1)*F].
    # Everything stays per-level: the permute gather then reads from a small
    # (~10 MB) footprint, which measures ~2x faster than gathering from the
    # level-concatenated stream (tools/bench_scatter2.py).
    g = gout.reshape(P, L, F)
    grads = []
    off = 0
    for lvl in range(L):
        upd = (ws[lvl][..., None] * g[:, None, lvl, :]).reshape(P * C, F)
        perm = maps.perm[lvl * P * C : (lvl + 1) * P * C] - lvl * P * C
        upd_sorted = upd[perm]  # the only indexed read of the stream
        csum = jnp.concatenate(
            [jnp.zeros((1, F), upd.dtype), jnp.cumsum(upd_sorted, axis=0)]
        )
        pos = maps.pos[off : off + rows[lvl] + 1].astype(jnp.int32)
        off += rows[lvl] + 1
        ends = csum[pos]  # one gather of used rows (+1 sentinel)
        g_used = ends[1:] - ends[:-1]
        if rows[lvl] < T:
            g_used = jnp.concatenate(
                [g_used, jnp.zeros((T - rows[lvl], F), g_used.dtype)], axis=0
            )
        grads.append(g_used)
    return (jnp.stack(grads).astype(table.dtype), None)


hashgrid_encode_static.defvjp(_static_fwd, _static_bwd)


# ---------------------------------------------------------------------------
# frequency (NeRF positional) encoding — reference dreammat_material.py:30-60
# ---------------------------------------------------------------------------

def frequency_encode(x: jnp.ndarray, n_frequencies: int, include_input: bool = True) -> jnp.ndarray:
    outs = [x] if include_input else []
    # host-side constants: jnp.arange inside a jitted caller is a tracer
    # and cannot round-trip through numpy
    for f in (2.0 ** np.arange(n_frequencies, dtype=np.float32)):
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def frequency_encoding_dims(n_input: int, n_frequencies: int, include_input: bool = True) -> int:
    return n_input * (2 * n_frequencies + (1 if include_input else 0))
