"""Volume-rendering family: implicit volume, NeRF renderer, marching tets,
dreamfusion system. CPU tests per SURVEY §4 (pure-function units + one tiny
end-to-end smoke)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401 (registry)
import dreammat_tpu.systems  # noqa: F401


def _tiny_volume(radius=1.0, **geo_over):
    geo = dreammat_tpu.find("implicit-volume")(
        {
            "radius": radius,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
            **geo_over,
        }
    )
    return geo


# ---------------------------------------------------------------- geometry
def test_density_bias_blobs():
    geo = _tiny_volume(density_bias="blob_magic3d",
                       density_blob_scale=10.0, density_blob_std=0.5)
    c = np.asarray(geo._density_bias(jnp.zeros((1, 3))))
    assert np.allclose(c, 10.0, atol=1e-5)  # scale*(1-0/std)
    edge = np.asarray(geo._density_bias(jnp.asarray([[0.5, 0.0, 0.0]])))
    assert np.allclose(edge, 0.0, atol=1e-4)  # scale*(1-1)

    geo2 = _tiny_volume(density_bias="blob_dreamfusion",
                        density_blob_scale=10.0, density_blob_std=0.5)
    c2 = np.asarray(geo2._density_bias(jnp.zeros((1, 3))))
    assert np.allclose(c2, 10.0, atol=1e-5)
    e2 = np.asarray(geo2._density_bias(jnp.asarray([[0.5, 0.0, 0.0]])))
    assert np.allclose(e2, 10.0 * np.exp(-0.5), atol=1e-4)


def test_implicit_volume_outputs_and_normals():
    geo = _tiny_volume(normal_type="finite_difference")
    params = geo.init(jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3), minval=-0.8, maxval=0.8)
    out = geo.apply(params, pts, output_normal=True)
    assert out["density"].shape == (5, 7, 1)
    assert out["features"].shape == (5, 7, 3)
    assert out["normal"].shape == (5, 7, 3)
    n = np.linalg.norm(np.asarray(out["normal"]), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-3)  # unit normals subsume finite

    # analytic normal agrees in direction with finite difference on the
    # (smooth) blob-dominated field
    geo_a = _tiny_volume(normal_type="analytic")
    out_a = geo_a.apply(params, pts.reshape(-1, 3), output_normal=True)
    cos = np.sum(
        np.asarray(out_a["normal"]) * np.asarray(out["normal"]).reshape(-1, 3), axis=-1
    )
    assert np.mean(cos) > 0.95


# ---------------------------------------------------------------- renderer
def _make_renderer(geo, estimator="occgrid", S=64, **over):
    mat = dreammat_tpu.find("diffuse-with-point-light-material")({"ambient_only_steps": 0})
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("nerf-volume-renderer")(
        {"radius": geo.cfg.radius, "num_samples_per_ray": S,
         "estimator": estimator, "grid_resolution": 8, **over},
        geo, mat, bg,
    )
    return ren, mat, bg


def test_ray_aabb():
    from dreammat_tpu.models.volume_renderer import ray_aabb

    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 3.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t0, t1 = ray_aabb(o, d, jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
    assert np.allclose(np.asarray(t0)[0], 2.0, atol=1e-5)
    assert np.allclose(np.asarray(t1)[0], 4.0, atol=1e-5)
    assert np.asarray(t1)[1] <= np.asarray(t0)[1]  # miss


def test_compositing_weights_opaque_wall():
    from dreammat_tpu.models.volume_renderer import NeRFVolumeRenderer

    sigma = jnp.concatenate([jnp.zeros((2, 8)), jnp.full((2, 8), 100.0)], axis=1)
    delta = jnp.full((2, 16), 0.1)
    w = np.asarray(NeRFVolumeRenderer._weights(sigma, delta))
    assert np.allclose(w[:, :8], 0.0)
    assert np.allclose(w.sum(axis=1), 1.0, atol=1e-3)  # saturates
    # manual T*alpha reference for a mixed row
    sigma2 = jnp.asarray([[1.0, 2.0, 0.5]])
    delta2 = jnp.asarray([[0.3, 0.2, 0.5]])
    w2 = np.asarray(NeRFVolumeRenderer._weights(sigma2, delta2))[0]
    T = 1.0
    exp = []
    for s, dl in zip([1.0, 2.0, 0.5], [0.3, 0.2, 0.5]):
        a = 1 - np.exp(-s * dl)
        exp.append(T * a)
        T *= np.exp(-s * dl)
    assert np.allclose(w2, exp, atol=1e-6)


def test_importance_resample_concentrates():
    geo = _tiny_volume()
    ren, _, _ = _make_renderer(geo, estimator="importance", S=64)
    N, Sc = 4, 16
    t0 = jnp.zeros((N,))
    t1 = jnp.full((N,), 4.0)
    tc = jnp.broadcast_to(jnp.linspace(0.125, 3.875, Sc)[None], (N, Sc))
    w = jnp.zeros((N, Sc)).at[:, 8].set(1.0)  # all mass in bin 8 (~t=2.1)
    t = np.asarray(ren._importance_resample(jax.random.PRNGKey(0), tc, w, t0, t1, 64))
    assert t.shape == (N, 64)
    assert np.all(np.diff(t, axis=1) >= -1e-5)  # sorted
    frac_in = np.mean((t > 1.8) & (t < 2.5))
    assert frac_in > 0.9  # concentrated in the heavy bin


def test_render_rays_blob_hit_and_miss():
    geo = _tiny_volume(density_bias="blob_magic3d", density_blob_scale=50.0,
                       density_blob_std=0.5)
    ren, mat, bg = _make_renderer(geo, estimator="occgrid", S=64)
    params = geo.init(jax.random.PRNGKey(0))
    bgp = bg.init(jax.random.PRNGKey(1))
    state = ren.init_state(jax.random.PRNGKey(2))
    state = ren.update_occ(params, state, jax.random.PRNGKey(3))

    rays_o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 2.5, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    light = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -3.0]])
    out = ren.render_rays(params, bgp, state, rays_o, rays_d, light,
                          jax.random.PRNGKey(4), is_train=False)
    op = np.asarray(out["opacity"])[:, 0]
    assert op[0] > 0.95      # through the blob center: opaque
    assert op[1] < 0.05      # 2.5 off-axis: outside bbox rows of the blob
    d = float(np.asarray(out["depth"])[0, 0])
    assert 2.2 < d < 3.2     # first-hit depth near the blob surface
    rgb = np.asarray(out["comp_rgb"])
    # composite over a [0,1] background with sigmoid-activated material
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0 + 1e-4


def test_occ_update_and_tighten():
    geo = _tiny_volume(density_bias="blob_magic3d", density_blob_scale=50.0,
                       density_blob_std=0.4)
    ren, _, _ = _make_renderer(geo, estimator="occgrid", S=32)
    params = geo.init(jax.random.PRNGKey(0))
    state = ren.init_state(jax.random.PRNGKey(1))
    state = ren.update_occ(params, state, jax.random.PRNGKey(2))
    occ_bin = np.asarray(ren._occ_binary(state))
    G = ren.cfg.grid_resolution
    assert occ_bin[G // 2, G // 2, G // 2]        # center occupied
    assert not occ_bin[0, 0, 0]                   # corner empty
    # tightened span is a strict subset of the AABB span for a center ray
    from dreammat_tpu.models.volume_renderer import ray_aabb

    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t0, t1 = ray_aabb(o, d, ren.bbox_lo, ren.bbox_hi)
    nt0, nt1 = ren._tighten_by_grid(jnp.asarray(occ_bin), o, d, t0, t1)
    assert float(nt0[0]) >= float(t0[0]) - 1e-5
    assert float(nt1[0]) <= float(t1[0]) + 1e-5
    assert (float(nt1[0]) - float(nt0[0])) < 0.9 * (float(t1[0]) - float(t0[0]))


# ---------------------------------------------------------------- marching
def test_marching_tets_sphere():
    from dreammat_tpu.ops.marching import marching_tets_grid

    R = 33
    xs = np.linspace(-1, 1, R).astype(np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    field = 0.6 - np.linalg.norm(g, axis=-1)  # positive inside r=0.6
    verts, faces = marching_tets_grid(field, xs)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert np.all(np.abs(r - 0.6) < 0.08)  # on the sphere (grid tolerance)
    # outward orientation: face normal aligns with radial direction
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    c = (v0 + v1 + v2) / 3
    c /= np.linalg.norm(c, axis=-1, keepdims=True) + 1e-12
    assert np.mean(np.sum(n * c, axis=-1) > 0) > 0.99
    # closed surface: every edge shared by exactly two faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    key = np.sort(e, axis=1)
    _, counts = np.unique(key[:, 0].astype(np.int64) * len(verts) + key[:, 1],
                          return_counts=True)
    assert np.all(counts == 2)


# ---------------------------------------------------------------- material
def test_diffuse_point_light_material_modes():
    mat = dreammat_tpu.find("diffuse-with-point-light-material")(
        {"ambient_only_steps": 10, "ambient_light_color": (0.1, 0.1, 0.1),
         "diffuse_light_color": (0.9, 0.9, 0.9)}
    )
    f = jnp.zeros((4, 3))  # sigmoid -> albedo 0.5
    pos = jnp.zeros((4, 3))
    nrm = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    light = jnp.asarray([[0.0, 0.0, 2.0]] * 4)  # straight above: ndotl=1
    # eval after ambient window: diffuse shading = albedo * (0.9*1 + 0.1)
    rgb = np.asarray(mat(f, pos, nrm, light, step=100, is_train=False))
    assert np.allclose(rgb, 0.5 * 1.0, atol=1e-5)
    # eval inside ambient window: raw albedo
    rgb0 = np.asarray(mat(f, pos, nrm, light, step=0, is_train=False))
    assert np.allclose(rgb0, 0.5, atol=1e-5)
    # training inside ambient window forces albedo regardless of rng
    rgbt = np.asarray(mat(f, pos, nrm, light, rng=jax.random.PRNGKey(0),
                          step=0, is_train=True))
    assert np.allclose(rgbt, 0.5, atol=1e-5)


# ------------------------------------------------------------------- e2e
@pytest.fixture(scope="module")
def df_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dreamfusion")
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreamfusion_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a red apple",
            f"exp_root_dir={tmp}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    return cfg, system, dm, state


def test_dreamfusion_trains(df_run):
    cfg, system, dm, state = df_run
    assert int(state["step"]) == 2
    leaves = jax.tree_util.tree_leaves({"geo": state["geo"], "bg": state["bg"]})
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])


def test_dreamfusion_eval_and_export(df_run):
    cfg, system, dm, state = df_run
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)
    gif = system.test(state, dm, cfg.trial_dir, 2, n_views=2)
    assert os.path.exists(gif)
    obj = system.export(state, cfg.trial_dir)
    assert os.path.exists(obj)
    # blob init => non-empty isosurface with vertex colors
    with open(obj) as f:
        head = f.readline().split()
    assert head and head[0] == "v" and len(head) == 7
