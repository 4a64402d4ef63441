"""Sketch-shape guidance (ops/shape_loss.py): winding number,
point-mesh distance, grid bake, and the latentnerf guide_shape path
(reference threestudio/utils/ops.py:316-421, systems/latentnerf.py:89-97).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401
from dreammat_tpu.ops import shape_loss as sl


def _cube(half=0.5):
    """Closed unit cube triangle soup centered at origin."""
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half)
         for z in (-half, half)], np.float32
    )
    # 12 triangles, outward-wound
    f = np.array([
        [0, 1, 3], [0, 3, 2],   # x = -h
        [4, 7, 5], [4, 6, 7],   # x = +h
        [0, 4, 5], [0, 5, 1],   # y = -h
        [2, 3, 7], [2, 7, 6],   # y = +h
        [0, 2, 6], [0, 6, 4],   # z = -h
        [1, 5, 7], [1, 7, 3],   # z = +h
    ], np.int32)
    return v, f


def test_winding_number_cube_inside_outside():
    v, f = _cube()
    tri = jnp.asarray(v[f])
    pts = jnp.asarray([
        [0.0, 0.0, 0.0], [0.2, -0.3, 0.1],      # inside
        [0.9, 0.0, 0.0], [0.0, 2.0, 0.0], [-0.7, 0.7, 0.7],  # outside
    ])
    w = np.asarray(sl.winding_number(pts, tri))
    assert np.allclose(w[:2], 1.0, atol=1e-4), w
    assert np.allclose(w[2:], 0.0, atol=1e-4), w


def test_point_mesh_distance_cube():
    v, f = _cube()
    tri = jnp.asarray(v[f])
    pts = jnp.asarray([
        [0.0, 0.0, 0.9],    # 0.4 above the +z face
        [0.0, 0.0, 0.0],    # center: 0.5 from every face
        [1.0, 1.0, 1.0],    # closest point is the corner (0.5,0.5,0.5)
    ])
    d2 = np.asarray(sl.point_mesh_sq_distance(pts, tri))
    assert np.allclose(d2[0], 0.4 ** 2, atol=1e-5)
    assert np.allclose(d2[1], 0.5 ** 2, atol=1e-5)
    assert np.allclose(d2[2], 3 * 0.5 ** 2, atol=1e-5)


def test_shape_grid_and_loss_ordering():
    """Densities matching the guide's interior must score lower CE than
    the inverted occupancy."""
    v, f = _cube()
    grid = sl.build_shape_grid(v, f, resolution=24, mesh_scale=0.7,
                               proximal_surface=0.3)
    # winding numbers of a closed cube lie in [-eps, 1+eps] (value
    # contract, subsumes finiteness)
    w = np.asarray(grid.winding)
    assert w.min() >= -0.25 and w.max() <= 1.25
    # interior fraction of a cube scaled so its max-radius is 0.7 inside
    # a [-1,1]^3 grid: strictly between 0 and 50%
    frac = float((np.asarray(grid.winding) > 0.5).mean())
    assert 0.01 < frac < 0.5

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (4096, 3), minval=-1.0, maxval=1.0)
    inside = sl._trilinear(grid.winding, pts, grid.bound) > 0.5
    dens_match = jnp.where(inside, 50.0, 0.0)
    dens_inverted = jnp.where(inside, 0.0, 50.0)
    l_match = float(sl.shape_loss(pts, dens_match, grid))
    l_inv = float(sl.shape_loss(pts, dens_inverted, grid))
    assert l_match < l_inv
    # gradient w.r.t. density is finite and nonzero
    g = jax.grad(lambda d: sl.shape_loss(pts, d, grid))(dens_match * 0.1)
    gmax = float(jnp.abs(g).max())
    assert 0.0 < gmax < 1e6  # nonzero and bounded (subsumes finite)


def _write_cube_obj(path):
    v, f = _cube()
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for t in f:
            fh.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def test_mesh_signed_distance_sign_and_magnitude():
    v, f = _cube()
    tri = jnp.asarray(v[f])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.9]])
    sd = np.asarray(sl.mesh_signed_distance(pts, tri, inside_positive=True))
    assert sd[0] > 0 and np.allclose(sd[0], 0.5, atol=1e-5)
    assert sd[1] < 0 and np.allclose(sd[1], -0.4, atol=1e-5)
    sd_neg = np.asarray(sl.mesh_signed_distance(pts, tri, inside_positive=False))
    assert np.allclose(sd_neg, -sd, atol=1e-6)


def test_dmtet_mesh_shape_init(tmp_path):
    """tetrahedra-sdf-grid shape_init=mesh:<path> bakes an inside-positive
    SDF whose zero crossing tracks the guide surface."""
    obj = str(tmp_path / "guide.obj")
    _write_cube_obj(obj)
    geo = dreammat_tpu.find("tetrahedra-sdf-grid")({
        "radius": 1.0, "isosurface_resolution": 12, "max_crossing_tets": 2048,
        "shape_init": f"mesh:{obj}", "shape_init_params": 0.6,
        "geometry_only": True,
    })
    params = geo.init(jax.random.PRNGKey(0))
    sdf = np.asarray(params["sdf"])
    verts = np.asarray(geo.lattice_verts)
    # load_mesh scales max |coord| to 0.6 -> the cube's interior is
    # |x|,|y|,|z| < 0.6; check sign at the center and far corners
    center = np.argmin(np.linalg.norm(verts, axis=1))
    assert sdf[center] > 0
    corner = np.argmax(np.linalg.norm(verts, axis=1))
    assert sdf[corner] < 0
    # the isosurface has faces
    mesh = geo.isosurface(params)
    assert int(np.asarray(mesh.valid).sum()) > 0


def test_implicit_sdf_mesh_shape_init(tmp_path):
    """implicit-sdf shape_init=mesh:<path> fits the MLP to the mesh SDF
    (negative inside, like the reference pysdf path)."""
    obj = str(tmp_path / "guide.obj")
    _write_cube_obj(obj)
    geo = dreammat_tpu.find("implicit-sdf")({
        "radius": 1.0, "shape_init": f"mesh:{obj}", "shape_init_params": 0.6,
        "shape_init_steps": 150, "n_feature_dims": 3,
        "pos_encoding_config": {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 10, "base_resolution": 4,
            "per_level_scale": 1.5,
        },
        "mlp_network_config": {"n_neurons": 16, "n_hidden_layers": 1},
    })
    params = geo.init(jax.random.PRNGKey(0))
    params = geo.initialize_shape(params, jax.random.PRNGKey(1))
    inside = geo.forward_sdf(params, jnp.zeros((1, 3)))
    outside = geo.forward_sdf(params, jnp.asarray([[0.0, 0.0, 0.95]]))
    assert float(inside[0, 0]) < 0 < float(outside[0, 0])


def test_latentnerf_guide_shape_trains(tmp_path):
    """latentnerf-system with guide_shape set: the grid bakes at configure
    and loss_shape joins the jitted step (reference latentnerf.py:27,
    89-97)."""
    from dreammat_tpu.utils.config import load_config

    obj = str(tmp_path / "guide.obj")
    _write_cube_obj(obj)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "sjc_tiny.yaml"),
        cli_args=[
            "system_type=latentnerf-system",
            "system.prompt_processor.prompt=a red apple",
            f"system.guide_shape={obj}",
            "system.guide_shape_grid_res=16",
            "system.loss.lambda_shape=5.0",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    assert system.shape_grid is not None
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
