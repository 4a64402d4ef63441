"""Fused flash attention (Pallas, TPU) for the diffusion UNet.

Replaces xformers/torch-SDPA in the reference guidance stack
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
dreammat_guidance.py:155-165) with an online-softmax attention kernel:
the [N,M] score matrix never materializes in HBM — K/V stream through VMEM
in blocks with running (max, denominator) statistics, fp32 accumulation,
bf16 MXU matmuls.

``attention(q,k,v)`` dispatches to the kernel on TPU when shapes allow and
falls back to ``jax.nn.dot_product_attention`` otherwise (CPU tests,
awkward shapes). Layout: [B, N, H, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int, scale: float):
    """One (batch*head, q_block) program: stream K/V blocks, online softmax."""
    q = q_ref[...].astype(jnp.float32) * scale  # [bq, d]
    bq, d = q.shape
    num_k_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # [bk, d]
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        # mask out-of-range K rows (kv_len may not divide block_k)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc, m0, l0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512):
    """q [B,N,H,D], k/v [B,M,H,D] -> [B,N,H,D]. Non-causal, no mask."""
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = 1.0 / np.sqrt(D)
    block_q = min(block_q, N)
    block_k = min(block_k, max(M, 128))

    # fold heads into batch; pad N to block_q and M to block_k
    qf = jnp.moveaxis(q, 2, 1).reshape(B * H, N, D)
    kf = jnp.moveaxis(k, 2, 1).reshape(B * H, M, D)
    vf = jnp.moveaxis(v, 2, 1).reshape(B * H, M, D)
    pad_n = (-N) % block_q
    pad_m = (-M) % block_k
    if pad_n:
        qf = jnp.pad(qf, ((0, 0), (0, pad_n), (0, 0)))
    if pad_m:
        kf = jnp.pad(kf, ((0, 0), (0, pad_m), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_m), (0, 0)))
    Np, Mp = N + pad_n, M + pad_m

    grid = (B * H, Np // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=M, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Mp, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Mp, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
    )(qf, kf, vf)
    out = out[:, :N].reshape(B, H, N, D)
    return jnp.moveaxis(out, 1, 2)


def reference_attention(q, k, v):
    """Plain softmax attention in fp32 (test oracle)."""
    B, N, H, D = q.shape
    scale = 1.0 / np.sqrt(D)
    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def _flash_attention_diff(q, k, v):
    return flash_attention(q, k, v)


def _flash_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    # backward via XLA's fused attention vjp (ControlNet training path);
    # the Pallas kernel stays the inference/forward fast path
    q, k, v = res
    _, vjp = jax.vjp(jax.nn.dot_product_attention, q, k, v)
    return vjp(g)


_flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)


def attention(q, k, v, use_pallas: str = "auto"):
    """Dispatch: Pallas flash kernel on TPU, XLA fused attention elsewhere.
    Differentiable in both paths (custom VJP around the kernel).
    Override with env DREAMMAT_ATTN=pallas|xla for A/B benchmarking."""
    import os

    override = os.environ.get("DREAMMAT_ATTN")
    if override:
        use_pallas = {"pallas": "always", "xla": "never"}.get(override, use_pallas)
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas == "never" or (use_pallas == "auto" and not on_tpu):
        return jax.nn.dot_product_attention(q, k, v)
    return _flash_attention_diff(q, k, v)
