import jax.numpy as jnp
import numpy as np

from dreammat_tpu.utils import ops


def test_ray_directions_center_pixel():
    H = W = 4
    d = ops.get_ray_directions(H, W, focal=100.0)
    assert d.shape == (4, 4, 3)
    # all z components are -1
    assert np.allclose(d[..., 2], -1.0)
    # symmetric about center
    assert np.allclose(np.asarray(d[0, 0, 0]), -np.asarray(d[0, 3, 0]))
    assert np.allclose(np.asarray(d[0, 0, 1]), -np.asarray(d[3, 0, 1]))
    # top row has +y (camera-space y up, image row 0 is top)
    assert float(d[0, 0, 1]) > 0


def test_c2w_lookat_origin():
    pos = ops.camera_position_from_spherical(0.0, 0.0, 2.0)  # on +x axis
    assert np.allclose(np.asarray(pos), [2.0, 0.0, 0.0], atol=1e-6)
    c2w = ops.get_c2w(pos[None])
    # camera forward (-z col) points toward origin => -x world
    fwd = -np.asarray(c2w[0, :3, 2])
    assert np.allclose(fwd, [-1.0, 0.0, 0.0], atol=1e-6)
    # camera up ~ +z world
    up = np.asarray(c2w[0, :3, 1])
    assert np.allclose(up, [0.0, 0.0, 1.0], atol=1e-6)


def test_w2c_inverts_c2w():
    pos = ops.camera_position_from_spherical(
        jnp.array([20.0, -35.0]), jnp.array([40.0, 130.0]), jnp.array([3.0, 3.5])
    )
    c2w = ops.get_c2w(pos)
    w2c = ops.get_w2c(c2w)
    eye = np.einsum("bij,bjk->bik", np.asarray(w2c), np.asarray(c2w))
    assert np.allclose(eye, np.eye(4)[None].repeat(2, 0), atol=1e-5)


def test_rays_through_center_hit_origin():
    """A center-ish ray from a look-at camera should pass near the origin."""
    pos = ops.camera_position_from_spherical(25.0, 60.0, 3.0)
    c2w = ops.get_c2w(pos[None])
    H = W = 33  # odd so there is an exact center pixel
    focal = 0.5 * H / np.tan(0.5 * np.deg2rad(40.0))
    dirs = ops.get_ray_directions(H, W, focal=float(focal), use_pixel_centers=True)
    rays_o, rays_d = ops.get_rays(dirs, c2w[0], keepdim=True)
    o = np.asarray(rays_o[H // 2, W // 2])
    d = np.asarray(rays_d[H // 2, W // 2])
    # closest approach of the center ray to origin
    tmin = -np.dot(o, d)
    closest = o + tmin * d
    assert np.linalg.norm(closest) < 1e-3


def test_projection_roundtrip():
    """Project a world point with mvp; it must land at the expected NDC spot,
    with the y-flip making +world-up appear at *smaller* ndc y (image top)."""
    pos = ops.camera_position_from_spherical(0.0, 0.0, 4.0)
    c2w = ops.get_c2w(pos[None])
    proj = ops.get_projection_matrix(jnp.deg2rad(jnp.array([45.0])), 1.0, 0.1, 1000.0)
    mvp, w2c = ops.get_mvp_matrix(c2w, proj)
    # origin projects to ndc center
    p = np.asarray(mvp[0]) @ np.array([0.0, 0.0, 0.0, 1.0])
    ndc = p[:3] / p[3]
    assert np.allclose(ndc[:2], 0.0, atol=1e-6)
    # a point above origin (world +z) should have negative ndc y (y-flip)
    p = np.asarray(mvp[0]) @ np.array([0.0, 0.0, 0.5, 1.0])
    assert p[1] / p[3] < 0


def test_orthogonal_directions():
    dirs = ops.safe_normalize(jnp.array([[1.0, 0.2, -0.3], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]))
    ortho = ops.get_orthogonal_directions(dirs)
    assert np.allclose(np.asarray(ops.dot(dirs, ortho))[:, 0], 0.0, atol=1e-6)
    assert np.allclose(np.linalg.norm(np.asarray(ortho), axis=-1), 1.0, atol=1e-5)


def test_fibonacci_hemisphere():
    # begin_elevation=0 samples the upper hemisphere (z in [0,1)), matching
    # the reference's tangent-space direction sets (dreammat_material.py:89-102)
    az, el = ops.sample_sphere_fibonacci(512)
    assert az.shape == (512,)
    pts = np.stack(
        [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)], axis=-1
    )
    assert (pts[:, 2] >= 0).all()
    # azimuthal uniformity: xy-mean ~ 0
    assert np.linalg.norm(pts[:, :2].mean(0)) < 0.05


def test_lin2srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = ops.srgb2lin(ops.lin2srgb(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_perpendicular_component():
    x = jnp.ones((2, 4, 4))
    y = jnp.ones((2, 4, 4))
    out = ops.perpendicular_component(x, y)
    assert np.allclose(np.asarray(out), 0.0, atol=1e-6)
