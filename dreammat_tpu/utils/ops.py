"""Camera math, activations and small geometry ops (JAX).

Coordinate conventions follow the reference exactly
(/root/reference/threestudio_dreammat/threestudio/utils/ops.py:179-292 and
data/uncond.py:735-800):

- world: right-handed, +z up; camera positions from spherical
  (elevation from xy-plane, azimuth from +x toward +y).
- camera: OpenGL style, looks down -z; ray dirs ((i-cx)/fx, -(j-cy)/fy, -1).
- projection has a negated [1,1] term (y flip) so that after the
  perspective divide, +y_ndc points *down* the image — row 0 is the top.
- mvp = proj @ w2c.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# small vector helpers
# ---------------------------------------------------------------------------

def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def saturate_dot(a, b):
    return jnp.clip(dot(a, b), 0.0, 1.0)


def safe_normalize(v, eps: float = 1e-8):
    """Normalize with a derivative-safe guard: ``d||v||/dv`` is NaN at
    v=0 (0/0), which poisons backward passes whenever a normal/direction
    degenerates to exactly zero (e.g. finite-difference normals at clipped
    bbox boundaries). rsqrt(sum v^2 + eps^2) has a finite gradient
    everywhere and matches 1/(||v||+eps) to first order."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)


def reflect(view_dirs, normals):
    """Mirror ``view_dirs`` (pointing away from surface) about ``normals``."""
    return dot(view_dirs, normals) * normals * 2.0 - view_dirs


# ---------------------------------------------------------------------------
# activations (reference ops.py:84-110 get_activation)
# ---------------------------------------------------------------------------

def lin2srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * jnp.power(x + 1e-12, 1.0 / 2.4) - 0.055)


def srgb2lin(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def get_activation(name):
    name = (name or "none").lower()
    table = {
        "none": lambda x: x,
        "identity": lambda x: x,
        "lin2srgb": lin2srgb,
        "srgb2lin": srgb2lin,
        "exp": jnp.exp,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
        "relu": jax.nn.relu,
        "trunc_exp": lambda x: jnp.exp(jnp.clip(x, -15.0, 15.0)),
        "shifted_softplus": lambda x: jax.nn.softplus(x - 1.0),
        "scale_-11_01": lambda x: x * 0.5 + 0.5,
    }
    if name in table:
        return table[name]
    if name.startswith("scale_"):
        scale = float(name[6:])
        return lambda x: x * scale
    raise ValueError(f"unknown activation '{name}'")


# ---------------------------------------------------------------------------
# cameras
# ---------------------------------------------------------------------------

def get_ray_directions(H: int, W: int, focal, principal=None, use_pixel_centers: bool = True):
    """Per-pixel ray directions in camera space, shape [H, W, 3]."""
    center = 0.5 if use_pixel_centers else 0.0
    if isinstance(focal, (int, float)):
        fx = fy = float(focal)
        cx, cy = W / 2.0, H / 2.0
    else:
        fx, fy = focal
        cx, cy = principal
    i = jnp.arange(W, dtype=jnp.float32) + center  # x, columns
    j = jnp.arange(H, dtype=jnp.float32) + center  # y, rows
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    return jnp.stack([(ii - cx) / fx, -(jj - cy) / fy, -jnp.ones_like(ii)], axis=-1)


def get_rays(directions, c2w, keepdim: bool = False):
    """Rotate camera-space directions into world space. Supports
    directions [H,W,3] + c2w [4,4] or [B,4,4]; and [B,H,W,3] + [B,4,4]."""
    if directions.ndim == 3 and c2w.ndim == 2:
        rays_d = jnp.einsum("hwc,kc->hwk", directions, c2w[:3, :3], precision="highest")
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    elif directions.ndim == 3 and c2w.ndim == 3:
        rays_d = jnp.einsum("hwc,bkc->bhwk", directions, c2w[:, :3, :3], precision="highest")
        rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    elif directions.ndim == 4 and c2w.ndim == 3:
        rays_d = jnp.einsum("bhwc,bkc->bhwk", directions, c2w[:, :3, :3], precision="highest")
        rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    else:
        raise ValueError(f"unsupported shapes {directions.shape} {c2w.shape}")
    rays_d = safe_normalize(rays_d)
    if not keepdim:
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    return rays_o, rays_d


def get_projection_matrix(fovy, aspect_wh: float, near: float, far: float):
    """OpenGL-style perspective with y-flip (reference ops.py:266-280).
    ``fovy`` is a [B] array in radians."""
    fovy = jnp.atleast_1d(jnp.asarray(fovy, dtype=jnp.float32))
    B = fovy.shape[0]
    t = jnp.tan(fovy / 2.0)
    proj = jnp.zeros((B, 4, 4), dtype=jnp.float32)
    proj = proj.at[:, 0, 0].set(1.0 / (t * aspect_wh))
    proj = proj.at[:, 1, 1].set(-1.0 / t)
    proj = proj.at[:, 2, 2].set(-(far + near) / (far - near))
    proj = proj.at[:, 2, 3].set(-2.0 * far * near / (far - near))
    proj = proj.at[:, 3, 2].set(-1.0)
    return proj


def get_c2w(camera_positions, center=None, up=None):
    """Look-at camera-to-world matrices, [B,4,4] (reference uncond.py:771-788)."""
    camera_positions = jnp.atleast_2d(camera_positions)
    B = camera_positions.shape[0]
    if center is None:
        center = jnp.zeros_like(camera_positions)
    if up is None:
        up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (B, 3))
    lookat = safe_normalize(center - camera_positions)
    right = safe_normalize(jnp.cross(lookat, up))
    up2 = safe_normalize(jnp.cross(right, lookat))
    rot = jnp.stack([right, up2, -lookat], axis=-1)  # columns
    c2w = jnp.concatenate([rot, camera_positions[:, :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1, 4))
    return jnp.concatenate([c2w, bottom], axis=1)


def get_w2c(c2w):
    """Invert rigid camera-to-world: R'=R^T, t'=-R^T t (reference ops.py:281-292)."""
    rt = jnp.swapaxes(c2w[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rt, c2w[..., :3, 3], precision="highest")
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[..., :3, :3].set(rt)
    w2c = w2c.at[..., :3, 3].set(t)
    w2c = w2c.at[..., 3, 3].set(1.0)
    return w2c


def get_mvp_matrix(c2w, proj):
    w2c = get_w2c(c2w)
    return jnp.einsum("...ij,...jk->...ik", proj, w2c, precision="highest"), w2c


def camera_position_from_spherical(elevation_deg, azimuth_deg, distance):
    """World-space camera positions; z-up (reference uncond.py:741-751)."""
    el = jnp.deg2rad(jnp.asarray(elevation_deg, dtype=jnp.float32))
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, dtype=jnp.float32))
    d = jnp.asarray(distance, dtype=jnp.float32)
    return jnp.stack(
        [d * jnp.cos(el) * jnp.cos(az), d * jnp.cos(el) * jnp.sin(az), d * jnp.sin(el)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# misc geometry
# ---------------------------------------------------------------------------

def get_orthogonal_directions(directions):
    """A tangent vector orthogonal to each direction
    (reference dreammat_material.py:542-552)."""
    x, y, z = directions[..., 0:1], directions[..., 1:2], directions[..., 2:3]
    zeros = jnp.zeros_like(x)
    otho0 = jnp.concatenate([y, -x, zeros], axis=-1)
    otho1 = jnp.concatenate([-z, zeros, x], axis=-1)
    use0 = jnp.linalg.norm(otho0, axis=-1, keepdims=True) > jnp.linalg.norm(
        otho1, axis=-1, keepdims=True
    )
    return safe_normalize(jnp.where(use0, otho0, otho1))


def perpendicular_component(x, y):
    """Component of x orthogonal to y, batched over leading dim
    (reference ops.py:431-440)."""
    axes = tuple(range(1, x.ndim))
    num = jnp.sum(x * y, axis=axes, keepdims=True)
    den = jnp.sum(y * y, axis=axes, keepdims=True) + 1e-8
    return x - (num / den) * y


def sample_sphere_fibonacci(num_samples: int, begin_elevation: float = 0.0):
    """Fibonacci-spiral sphere sampling returning (azimuths, elevations) in
    radians (reference dreammat_material.py:89-102). Host-side numpy-free."""
    import numpy as np

    ratio = (begin_elevation + 90.0) / 180.0
    num_points = int(num_samples // (1.0 - ratio))
    phi = (math.sqrt(5.0) - 1.0) / 2.0
    n = np.arange(num_points - num_samples, num_points)
    z = 2.0 * n / num_points - 1.0
    azimuths = (2.0 * math.pi * n * phi) % (2.0 * math.pi)
    elevations = np.arcsin(z)
    return azimuths.astype("float32"), elevations.astype("float32")


def scale_tensor(x, src_range, dst_range):
    """Affine rescale from src interval to dst interval (reference ops.py:63-78)."""
    s0, s1 = src_range
    d0, d1 = dst_range
    return (x - s0) / (s1 - s0) * (d1 - d0) + d0


def contract_to_unisphere(points, bbox):
    """Normalize points inside an axis-aligned bbox [[min],[max]] to (0,1)."""
    lo, hi = bbox[0], bbox[1]
    return (points - lo) / (hi - lo)


def chunk_batch(fn, chunk_size: int, *args):
    """Apply ``fn`` over fixed-size chunks of the leading axis and
    concatenate results (reference ops.py:112-176). Static-shape version:
    pads the last chunk, maps with lax.map, trims. Works for array or
    dict-of-array outputs."""
    if chunk_size <= 0:
        return fn(*args)
    n = args[0].shape[0]
    pad = (-n) % chunk_size

    def pad_leaf(x):
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

    padded = [pad_leaf(a) for a in args]
    chunked = [a.reshape(-1, chunk_size, *a.shape[1:]) for a in padded]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(chunked))
    return jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:])[:n], out
    )
