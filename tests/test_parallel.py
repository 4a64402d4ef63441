import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammat_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_batch, shard_rays, tp_shard_params,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(n_data=4, n_model=2)


def test_mesh_axes(mesh8):
    assert dict(mesh8.shape) == {"data": 4, "model": 2}
    # the mesh covers 8 DISTINCT devices in (data, model) major order
    devs = np.asarray(mesh8.devices)
    assert devs.shape == (4, 2)
    assert len({d.id for d in devs.reshape(-1)}) == 8
    assert tuple(mesh8.axis_names) == ("data", "model")


def test_batch_sharding_roundtrip(mesh8):
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    xs = shard_batch(mesh8, x)
    assert np.allclose(np.asarray(xs), np.asarray(x))


def test_tp_sharded_unet_matches_replicated(mesh8):
    """Tensor-parallel param placement must not change the math — XLA inserts
    the collectives; outputs stay identical."""
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.asarray([3.0, 7.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(2), sample, t, ctx)

    ref = model.apply(params, sample, t, ctx)
    sharded = tp_shard_params(mesh8, params)
    # verify at least one kernel actually got a model-axis sharding
    specs = [
        x.sharding.spec for x in jax.tree_util.tree_leaves(sharded)
        if hasattr(x, "sharding") and hasattr(x.sharding, "spec")
    ]
    assert any("model" in str(s) for s in specs), specs
    out = jax.jit(model.apply)(sharded, sample, t, ctx)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_shard_rays_matches_local(mesh8):
    def fn(x, y):
        return x * 2.0 + y

    x = jax.random.normal(jax.random.PRNGKey(0), (37, 4))
    y = jnp.ones((37, 4))
    out = shard_rays(mesh8, fn, x, y)
    assert np.allclose(np.asarray(out), np.asarray(x * 2 + y), atol=1e-6)


class TestDistributed:
    """Multi-host control plane (parallel/distributed.py). Single-host here:
    helpers must be exact no-ops; the real-coordinator path is exercised by
    initializing a 1-process group (same code path as a pod, minus peers).
    Reference analogs: utils/misc.py:104-120 barrier/broadcast,
    prompt_processors/base.py:364-416 rank-0 cache + barrier."""

    def test_single_host_noops(self):
        from dreammat_tpu.parallel import distributed as dist

        assert dist.process_count() >= 1
        assert dist.is_rank_zero() == (dist.process_index() == 0)
        dist.barrier("test")  # must not hang or raise on single host

    def test_rank_zero_fill(self, tmp_path):
        from dreammat_tpu.parallel import distributed as dist

        p = str(tmp_path / "cache.npy")
        calls = []
        assert dist.rank_zero_fill(p, lambda: (calls.append(1), open(p, "w").write("a")))
        assert calls == [1]
        # second call: artifact exists, fill_fn must NOT run again
        assert dist.rank_zero_fill(p, lambda: calls.append(2))
        assert calls == [1]

    def test_maybe_initialize_env_gated(self, monkeypatch):
        from dreammat_tpu.parallel import distributed as dist

        # without any multi-host env, initialize must not be attempted
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("DREAMMAT_MULTIHOST", raising=False)
        pid, pn = dist.maybe_initialize()
        assert (pid, pn) == (jax.process_index(), jax.process_count())
