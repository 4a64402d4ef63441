import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammat_tpu.ops import attention as attn_lib


def _mk(B, N, M, H, D, seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(k, 3)
    q = jax.random.normal(kq, (B, N, H, D), dtype)
    kk_ = jax.random.normal(kk, (B, M, H, D), dtype)
    v = jax.random.normal(kv, (B, M, H, D), dtype)
    return q, kk_, v


SHAPES = [
    (1, 256, 256, 2, 64),    # self-attn, exact blocks
    (2, 300, 300, 4, 64),    # padding on both axes
    (1, 256, 77, 4, 64),     # cross-attn (kv shorter than a block)
    (1, 64, 64, 1, 32),      # small everything
    (1, 200, 200, 2, 64),    # ADVICE r4: 128<N<block_q, N%16!=0 — the clamp
                             # must re-round block_q to a 16-sublane multiple
]


@pytest.mark.parametrize("shape", SHAPES)
def test_flash_matches_reference(shape):
    # interpret mode on CPU exercises the exact kernel logic
    B, N, M, H, D = shape
    q, k, v = _mk(B, N, M, H, D)
    ref = attn_lib.reference_attention(q, k, v)
    out = attn_lib.flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )


@pytest.mark.parametrize("shape", SHAPES)
def test_flash_backward_matches_reference(shape):
    """Pallas dq/dk/dv kernels vs the fp32 oracle's autodiff (VERDICT r1 #9:
    ControlNet training must get the kernel, not the XLA fallback)."""
    B, N, M, H, D = shape
    q, k, v = _mk(B, N, M, H, D, seed=3)
    W = jax.random.normal(jax.random.PRNGKey(9), (B, N, H, D))

    def loss_flash(q, k, v):
        return jnp.sum(attn_lib._flash_attention_diff(q, k, v, True) * W)

    def loss_ref(q, k, v):
        return jnp.sum(attn_lib.reference_attention(q, k, v) * W)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        gf, gr = np.asarray(gf), np.asarray(gr)
        err = np.abs(gf - gr).max()
        assert err < 5e-3, (name, err)


def test_flash_backward_bf16():
    """bf16 inputs (the UNet's training dtype): grads finite and aligned
    with the fp32 oracle's direction."""
    q, k, v = _mk(1, 128, 128, 2, 64, seed=5, dtype=jnp.bfloat16)
    W = jax.random.normal(jax.random.PRNGKey(9), (1, 128, 2, 64))

    def loss_flash(q, k, v):
        return jnp.sum(attn_lib._flash_attention_diff(q, k, v, True).astype(jnp.float32) * W)

    def loss_ref(q, k, v):
        return jnp.sum(
            attn_lib.reference_attention(
                q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
            ) * W
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for gf, gr in zip(g_flash, g_ref):
        gf = np.asarray(gf, dtype=np.float32).ravel()
        gr = np.asarray(gr).ravel()
        assert np.isfinite(gf).all()
        cos = gf @ gr / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-9)
        assert cos > 0.99, cos


def test_dispatch_fallback_cpu():
    q, k, v = _mk(1, 32, 32, 2, 16)
    out = attn_lib.attention(q, k, v)  # CPU -> fallback path
    ref = attn_lib.reference_attention(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
