"""Implicit volume geometry: hashgrid + MLP density/feature field.

TPU-native rebuild of ``ImplicitVolume``
(/root/reference/threestudio_dreammat/threestudio/models/geometry/
implicit_volume.py:19-269): a multiresolution hash encoding feeding two
small MLPs (density 1ch, features Nf), with a pre-activation density bias
("blob_magic3d" linear-falloff or "blob_dreamfusion" gaussian,
implicit_volume.py:81-101) so optimization starts from a centered blob,
and three normal modes (finite_difference / pred / analytic,
implicit_volume.py:134-189).

Everything is a pure function over a pytree of parameters; the analytic
normal is a real ``jax.grad`` through the field instead of the reference's
``torch.autograd.grad`` with manual ``create_graph`` plumbing. Queries are
dense ``[..., 3]`` arrays at fixed shapes so the whole sampling stack stays
inside one jitted render.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.utils.ops import safe_normalize
from dreammat_tpu.ops import hashgrid as hg
from dreammat_tpu.ops import mlp as mlp_lib
from dreammat_tpu.utils.base import BaseObject


@dreammat_tpu.register("implicit-volume")
class ImplicitVolume(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        n_input_dims: int = 3
        n_feature_dims: int = 3
        density_activation: str = "softplus"
        density_bias: Any = "blob_magic3d"  # float | "blob_magic3d" | "blob_dreamfusion"
        density_blob_scale: float = 10.0
        density_blob_std: float = 0.5
        pos_encoding_config: dict = field(
            default_factory=lambda: {
                "otype": "HashGrid",
                "n_levels": 16,
                "n_features_per_level": 2,
                "log2_hashmap_size": 19,
                "base_resolution": 16,
                "per_level_scale": 1.447269237440378,
            }
        )
        mlp_network_config: dict = field(
            default_factory=lambda: {
                "otype": "VanillaMLP",
                "activation": "ReLU",
                "output_activation": "none",
                "n_neurons": 64,
                "n_hidden_layers": 1,
            }
        )
        # in ["pred", "finite_difference", "finite_difference_laplacian", "analytic"]
        normal_type: str = "finite_difference"
        finite_difference_normal_eps: float = 0.01
        isosurface_threshold: float = 25.0
        isosurface_resolution: int = 96

    cfg: Config

    def configure(self) -> None:
        pc = dict(self.cfg.pos_encoding_config)
        pc.pop("otype", None)
        self.enc_cfg = hg.HashGridConfig(n_input_dims=self.cfg.n_input_dims, **pc)
        nc = self.cfg.mlp_network_config
        dims = lambda n_out: mlp_lib.vanilla_mlp_dims(
            self.enc_cfg.n_output_dims, n_out,
            n_neurons=nc.get("n_neurons", 64),
            n_hidden_layers=nc.get("n_hidden_layers", 1),
        )
        self.density_dims = dims(1)
        self.feature_dims = dims(self.cfg.n_feature_dims) if self.cfg.n_feature_dims > 0 else None
        self.normal_dims = dims(3) if self.cfg.normal_type == "pred" else None
        r = self.cfg.radius
        self.bbox = jnp.asarray([[-r, -r, -r], [r, r, r]], dtype=jnp.float32)
        # volume systems never carry a mesh; launch.py still constructs the
        # datamodule with (renderer, material) and the datamodule checks this
        self.mesh = None

    # -- params -------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        ks = jax.random.split(rng, 4)
        p = {
            "table": hg.init_hashgrid(ks[0], self.enc_cfg),
            "density_mlp": mlp_lib.init_mlp(ks[1], self.density_dims),
        }
        if self.feature_dims is not None:
            p["feature_mlp"] = mlp_lib.init_mlp(ks[2], self.feature_dims)
        if self.normal_dims is not None:
            p["normal_mlp"] = mlp_lib.init_mlp(ks[3], self.normal_dims)
        return p

    # -- field --------------------------------------------------------------
    def _encode(self, params, points):
        x = (points - self.bbox[0]) / (self.bbox[1] - self.bbox[0])
        x = jnp.clip(x, 0.0, 1.0)
        return hg.hashgrid_encode(params["table"], x.reshape(-1, 3), self.enc_cfg)

    def _density_bias(self, points):
        cfg = self.cfg
        if cfg.density_bias == "blob_dreamfusion":
            # gaussian blob (implicit_volume.py:81-88)
            return cfg.density_blob_scale * jnp.exp(
                -0.5 * jnp.sum(points**2, axis=-1, keepdims=True)
                / cfg.density_blob_std**2
            )
        if cfg.density_bias == "blob_magic3d":
            # linear-falloff blob (implicit_volume.py:89-97)
            return cfg.density_blob_scale * (
                1.0
                - jnp.sqrt(jnp.sum(points**2, axis=-1, keepdims=True) + 1e-12)
                / cfg.density_blob_std
            )
        return jnp.float32(cfg.density_bias)

    def _activate_density(self, points, raw):
        raw = raw + self._density_bias(points)
        act = self.cfg.density_activation
        if act == "softplus":
            d = jax.nn.softplus(raw)
        elif act in ("trunc_exp", "exp"):
            d = jnp.exp(jnp.clip(raw, -15.0, 15.0))
        elif act == "none":
            d = raw
        else:
            raise ValueError(f"unknown density activation {act}")
        return raw, d

    def forward_density(self, params: Dict[str, Any], points: jnp.ndarray) -> jnp.ndarray:
        """points [..., 3] world -> activated density [..., 1]."""
        enc = self._encode(params, points)
        raw = mlp_lib.apply_mlp(params["density_mlp"], enc).reshape(*points.shape[:-1], 1)
        _, d = self._activate_density(points, raw)
        return d

    def apply(
        self, params: Dict[str, Any], points: jnp.ndarray, output_normal: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """Full field query (implicit_volume.py:106-193): density (+features,
        +normal). ``points`` is [..., 3] in world coordinates."""
        cfg = self.cfg
        enc = self._encode(params, points)
        raw = mlp_lib.apply_mlp(params["density_mlp"], enc).reshape(*points.shape[:-1], 1)
        _, density = self._activate_density(points, raw)
        out = {"density": density}
        if self.feature_dims is not None:
            out["features"] = mlp_lib.apply_mlp(params["feature_mlp"], enc).reshape(
                *points.shape[:-1], cfg.n_feature_dims
            )
        if output_normal:
            if cfg.normal_type in ("finite_difference", "finite_difference_laplacian"):
                eps = cfg.finite_difference_normal_eps
                if cfg.normal_type == "finite_difference_laplacian":
                    offs = jnp.asarray(
                        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
                         [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
                        jnp.float32,
                    )
                    po = jnp.clip(points[..., None, :] + offs, -cfg.radius, cfg.radius)
                    do = self.forward_density(params, po)  # [..., 6, 1]
                    normal = -0.5 * (do[..., 0::2, 0] - do[..., 1::2, 0]) / eps
                else:
                    offs = jnp.asarray(
                        [[eps, 0, 0], [0, eps, 0], [0, 0, eps]], jnp.float32
                    )
                    po = jnp.clip(points[..., None, :] + offs, -cfg.radius, cfg.radius)
                    do = self.forward_density(params, po)  # [..., 3, 1]
                    normal = -(do[..., :, 0] - density) / eps
            elif cfg.normal_type == "pred":
                normal = mlp_lib.apply_mlp(params["normal_mlp"], enc).reshape(
                    *points.shape[:-1], 3
                )
            elif cfg.normal_type == "analytic":
                # -grad of density wrt position, batched via vmap over the
                # flattened point set (implicit_volume.py:178-187)
                flat = points.reshape(-1, 3)
                g = jax.vmap(
                    jax.grad(lambda p: self.forward_density(params, p[None])[0, 0])
                )(flat)
                normal = -g.reshape(*points.shape[:-1], 3)
            else:
                raise ValueError(f"unknown normal type {cfg.normal_type}")
            normal = safe_normalize(normal)
            out["normal"] = normal
            out["shading_normal"] = normal
        return out

    # -- isosurface (export path) -------------------------------------------
    def isosurface_mesh(self, params: Dict[str, Any]):
        """Extract a triangle mesh at ``isosurface_threshold`` via marching
        tetrahedra on a dense grid (reference uses PyMCubes/marching-tets,
        isosurface.py:23-109; here a 6-tets-per-cube host-side extraction —
        no native dependency)."""
        from dreammat_tpu.ops.marching import marching_tets_grid

        import numpy as np

        res = self.cfg.isosurface_resolution
        r = self.cfg.radius
        xs = np.linspace(-r, r, res, dtype=np.float32)
        grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
        pts = jnp.asarray(grid.reshape(-1, 3))
        # chunked density eval to bound memory at res^3 points
        n = pts.shape[0]
        chunk = 1 << 18
        dens = []
        f = jax.jit(lambda p: self.forward_density(params, p)[..., 0])
        for i in range(0, n, chunk):
            end = min(i + chunk, n)
            pad = chunk - (end - i)
            block = jnp.pad(pts[i:end], ((0, pad), (0, 0)))
            dens.append(np.asarray(f(block))[: end - i])
        field = np.concatenate(dens).reshape(res, res, res)
        # level set: field - threshold = 0 (forward_level negates; the
        # extraction is sign-symmetric so the orientation fix is in
        # marching_tets_grid's vertex order)
        return marching_tets_grid(field - float(self.cfg.isosurface_threshold), xs)

    def export(self, params: Dict[str, Any], points: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        if self.feature_dims is not None:
            enc = self._encode(params, points)
            out["features"] = mlp_lib.apply_mlp(params["feature_mlp"], enc).reshape(
                *points.shape[:-1], self.cfg.n_feature_dims
            )
        return out


def trilinear_sample(grid: jnp.ndarray, x01: jnp.ndarray) -> jnp.ndarray:
    """Trilinear fetch from a dense [G1,G2,G3,C] grid at [..., 3] coords in
    [0, 1] (cell-centered, clamped borders — the align_corners=False
    behavior of the reference's F.grid_sample, volume_grid.py:66-77)."""
    G = jnp.asarray(grid.shape[:3], jnp.float32)
    f = x01 * G - 0.5
    i0 = jnp.floor(f).astype(jnp.int32)
    w = (f - i0)[..., None]
    lo = jnp.clip(i0, 0, jnp.asarray(grid.shape[:3]) - 1)
    hi = jnp.clip(i0 + 1, 0, jnp.asarray(grid.shape[:3]) - 1)
    wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]

    def at(ix, iy, iz):
        return grid[ix, iy, iz]

    c000 = at(lo[..., 0], lo[..., 1], lo[..., 2])
    c100 = at(hi[..., 0], lo[..., 1], lo[..., 2])
    c010 = at(lo[..., 0], hi[..., 1], lo[..., 2])
    c110 = at(hi[..., 0], hi[..., 1], lo[..., 2])
    c001 = at(lo[..., 0], lo[..., 1], hi[..., 2])
    c101 = at(hi[..., 0], lo[..., 1], hi[..., 2])
    c011 = at(lo[..., 0], hi[..., 1], hi[..., 2])
    c111 = at(hi[..., 0], hi[..., 1], hi[..., 2])
    c00 = c000 * (1 - wx) + c100 * wx
    c10 = c010 * (1 - wx) + c110 * wx
    c01 = c001 * (1 - wx) + c101 * wx
    c11 = c011 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


@dreammat_tpu.register("volume-grid")
class VolumeGrid(ImplicitVolume):
    """Dense voxel-grid density/feature field (reference ``VolumeGrid``,
    /root/reference/threestudio_dreammat/threestudio/models/geometry/
    volume_grid.py:14-190): one trainable [G,G,G, 1+Nf] grid sampled
    trilinearly, exp density scale, the magic3d-style linear blob bias, and
    finite-difference / predicted-grid normals. No MLPs — the grid IS the
    field, which XLA turns into pure gathers (cheap on VPU)."""

    @dataclass
    class Config(ImplicitVolume.Config):
        grid_size: Any = (100, 100, 100)
        density_bias: Any = "blob"
        density_blob_scale: float = 5.0
        density_blob_std: float = 0.5
        isosurface_threshold: float = 1.0

    cfg: Config

    def configure(self) -> None:
        r = self.cfg.radius
        self.bbox = jnp.asarray([[-r, -r, -r], [r, r, r]], dtype=jnp.float32)
        self.grid_size = tuple(int(g) for g in self.cfg.grid_size)
        self.feature_dims = (
            self.cfg.n_feature_dims if self.cfg.n_feature_dims > 0 else None
        )
        self.mesh = None

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        p = {
            "grid": jnp.zeros((*self.grid_size, 1 + self.cfg.n_feature_dims)),
            "density_scale": jnp.float32(0.0),
        }
        if self.cfg.normal_type == "pred":
            p["normal_grid"] = jnp.zeros((*self.grid_size, 3))
        return p

    def _density_bias(self, points):
        cfg = self.cfg
        if cfg.density_bias == "blob":
            # volume_grid.py:48-60: linear falloff (same as blob_magic3d)
            return cfg.density_blob_scale * (
                1.0
                - jnp.sqrt(jnp.sum(points**2, axis=-1, keepdims=True) + 1e-12)
                / cfg.density_blob_std
            )
        return super()._density_bias(points)

    def _x01(self, points):
        x = (points - self.bbox[0]) / (self.bbox[1] - self.bbox[0])
        return jnp.clip(x, 0.0, 1.0)

    def forward_density(self, params: Dict[str, Any], points: jnp.ndarray) -> jnp.ndarray:
        raw = trilinear_sample(params["grid"], self._x01(points))[..., 0:1]
        raw = raw * jnp.exp(params["density_scale"])
        _, d = self._activate_density(points, raw)
        return d

    def apply(
        self, params: Dict[str, Any], points: jnp.ndarray, output_normal: bool = False
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        out_grid = trilinear_sample(params["grid"], self._x01(points))
        raw = out_grid[..., 0:1] * jnp.exp(params["density_scale"])
        _, density = self._activate_density(points, raw)
        out = {"density": density}
        if self.feature_dims is not None:
            out["features"] = out_grid[..., 1:]
        if output_normal:
            if cfg.normal_type in ("finite_difference", "finite_difference_laplacian"):
                eps = cfg.finite_difference_normal_eps
                if cfg.normal_type == "finite_difference_laplacian":
                    offs = jnp.asarray(
                        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
                         [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
                        jnp.float32,
                    )
                    po = jnp.clip(points[..., None, :] + offs, -cfg.radius, cfg.radius)
                    do = self.forward_density(params, po)
                    normal = -0.5 * (do[..., 0::2, 0] - do[..., 1::2, 0]) / eps
                else:
                    offs = jnp.asarray(
                        [[eps, 0, 0], [0, eps, 0], [0, 0, eps]], jnp.float32
                    )
                    po = jnp.clip(points[..., None, :] + offs, -cfg.radius, cfg.radius)
                    do = self.forward_density(params, po)
                    normal = -(do[..., :, 0] - density) / eps
            elif cfg.normal_type == "pred":
                normal = trilinear_sample(params["normal_grid"], self._x01(points))
            else:
                raise ValueError(f"unknown normal type {cfg.normal_type}")
            normal = safe_normalize(normal)
            out["normal"] = normal
            out["shading_normal"] = normal
        return out

    def export(self, params: Dict[str, Any], points: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.feature_dims is None:
            return {}
        return {
            "features": trilinear_sample(params["grid"], self._x01(points))[..., 1:]
        }
