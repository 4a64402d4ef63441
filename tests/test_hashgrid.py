import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.ops import hashgrid as hg
from dreammat_tpu.ops import mlp as mlp_lib


def test_hashgrid_shapes_and_dtype():
    cfg = hg.HashGridConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg)
    assert table.shape == (4, 1024, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3))
    out = hg.hashgrid_encode(table, x, cfg)
    assert out.shape == (37, 8)
    assert out.dtype == jnp.float32


def test_hashgrid_interpolation_exact_at_corners():
    """At integer grid coordinates the encoding must equal the stored feature."""
    cfg = hg.HashGridConfig(
        n_levels=1, n_features_per_level=2, log2_hashmap_size=12,
        base_resolution=4, per_level_scale=1.0,
    )
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4  # make features O(1)
    # corner (1,2,3) of the 4-res grid -> x = (0.25, 0.5, 0.75)
    x = jnp.asarray([[0.25, 0.5, 0.75]])
    out = hg.hashgrid_encode(table, x, cfg)
    # compute expected dense index: 1 + 2*5 + 3*25 = 86
    expected = np.asarray(table[0, 86])
    assert np.allclose(np.asarray(out[0]), expected, atol=1e-5)


def test_hashgrid_linear_interp_midpoint():
    cfg = hg.HashGridConfig(
        n_levels=1, n_features_per_level=1, log2_hashmap_size=12,
        base_resolution=2, per_level_scale=1.0,
    )
    table = jnp.zeros((1, 4096, 1))
    # set two corners along x: (0,0,0) idx 0 and (1,0,0) idx 1
    table = table.at[0, 0, 0].set(2.0)
    table = table.at[0, 1, 0].set(4.0)
    x = jnp.asarray([[0.25, 0.0, 0.0]])  # halfway between corners 0 and 1
    out = hg.hashgrid_encode(table, x, cfg)
    assert abs(float(out[0, 0]) - 3.0) < 1e-5


def test_hashgrid_grad_flows():
    cfg = hg.HashGridConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(t):
        return jnp.sum(hg.hashgrid_encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    gmax = float(jnp.abs(g).max())
    assert 0 < gmax < 1e6  # nonzero and bounded (subsumes finite)


def test_hashgrid_2d():
    cfg = hg.HashGridConfig(n_input_dims=2, n_levels=3, log2_hashmap_size=10, base_resolution=4)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 2))
    out = hg.hashgrid_encode(table, x, cfg)
    assert out.shape == (9, 6)
    # 2D corner exactness: dense level-0 index of corner (1,2) on the
    # 4-res grid (stride 5 per axis) is 1 + 2*5 = 11
    cfg1 = hg.HashGridConfig(n_input_dims=2, n_levels=1, n_features_per_level=2,
                             log2_hashmap_size=12, base_resolution=4,
                             per_level_scale=1.0)
    t1 = hg.init_hashgrid(jax.random.PRNGKey(0), cfg1) * 1e4
    got = hg.hashgrid_encode(t1, jnp.asarray([[0.25, 0.5]]), cfg1)
    assert np.allclose(np.asarray(got[0]), np.asarray(t1[0, 11]), atol=1e-5)


def test_frequency_encoding():
    x = jnp.ones((5, 3)) * 0.3
    out = hg.frequency_encode(x, 4)
    assert out.shape == (5, hg.frequency_encoding_dims(3, 4))
    # closed form: [x] + (sin,cos) pairs of 2^k * x per dim; the full set of
    # values per row must equal {0.3} U {sin,cos}(2^k * 0.3) for k<4
    vals = sorted(np.unique(np.round(np.asarray(out[0]), 6)))
    expect = sorted(np.unique(np.round(np.concatenate(
        [[0.3]] + [[np.sin((2.0 ** k) * 0.3), np.cos((2.0 ** k) * 0.3)]
                   for k in range(4)]), 6)))
    assert np.allclose(vals, expect, atol=1e-5)


def test_mlp_shapes_and_grad():
    dims = mlp_lib.vanilla_mlp_dims(32, 5, 64, 1)
    assert dims == [32, 64, 5]
    params = mlp_lib.init_mlp(jax.random.PRNGKey(0), dims)
    x = jnp.ones((7, 32))
    y = mlp_lib.apply_mlp(params, x)
    assert y.shape == (7, 5)
    g = jax.grad(lambda p: jnp.sum(mlp_lib.apply_mlp(p, x) ** 2))(params)
    assert float(jnp.abs(g["w"][0]).sum()) > 0


def test_geometry_component():
    import dreammat_tpu
    from dreammat_tpu.models import geometry  # noqa: F401
    from dreammat_tpu.models.mesh import make_icosphere

    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid",
                "n_levels": 4,
                "n_features_per_level": 2,
                "log2_hashmap_size": 10,
                "base_resolution": 4,
                "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    params = geo.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (11, 3), minval=-1, maxval=1)
    feats = geo.apply(params, pts)
    assert feats.shape == (11, 5)
    # deterministic in params+points, and actually a function of position
    feats2 = geo.apply(params, pts)
    assert np.array_equal(np.asarray(feats), np.asarray(feats2))
    feats3 = geo.apply(params, pts + 0.05)
    assert not np.allclose(np.asarray(feats), np.asarray(feats3))
    # grads flow into the hashgrid table through the component API
    g = jax.grad(lambda p: jnp.sum(geo.apply(p, pts) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
