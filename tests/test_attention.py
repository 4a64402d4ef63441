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


@pytest.mark.parametrize("shape", [
    (1, 256, 256, 2, 64),    # self-attn, exact blocks
    (2, 300, 300, 4, 64),    # padding on both axes
    (1, 256, 77, 4, 64),     # cross-attn (kv shorter than a block)
    (1, 64, 64, 1, 32),      # small everything
])
def test_flash_matches_reference(shape):
    # interpret mode on CPU exercises the exact kernel logic
    B, N, M, H, D = shape
    q, k, v = _mk(B, N, M, H, D)
    import functools

    from jax.experimental import pallas as pl

    ref = attn_lib.reference_attention(q, k, v)
    # run the pallas kernel in interpreter mode (CPU)
    with jax.disable_jit():
        pass
    out = _interpret_flash(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )


def _interpret_flash(q, k, v, block_q=128, block_k=128):
    """flash_attention with interpret=True plumbing (CPU test path)."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl

    B, N, H, D = q.shape
    M = k.shape[1]
    scale = 1.0 / np.sqrt(D)
    block_q = min(block_q, N)
    block_k = min(block_k, max(M, 16))
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
        functools.partial(attn_lib._flash_kernel, kv_len=M, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Mp, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Mp, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        interpret=True,
    )(qf, kf, vf)
    out = out[:, :N].reshape(B, H, N, D)
    return jnp.moveaxis(out, 1, 2)


def test_dispatch_fallback_cpu():
    q, k, v = _mk(1, 32, 32, 2, 16)
    out = attn_lib.attention(q, k, v)  # CPU -> fallback path
    ref = attn_lib.reference_attention(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
