"""Tetrahedra SDF grid (DMTet) geometry: explicit differentiable mesh.

TPU-native rebuild of ``tetrahedra-sdf-grid``
(/root/reference/threestudio_dreammat/threestudio/models/geometry/
tetrahedra_sdf_grid.py:26-369): trainable per-lattice-vertex SDF values
(+ optional per-vertex deformation) on a tet lattice; ``isosurface``
extracts a differentiable triangle mesh via marching tets
(``ops/dmtet.py`` — fixed face budget instead of the reference's ragged
kaolin compaction); an optional hashgrid+MLP feature field colors the
surface. ``shape_init`` fits the SDF grid to a sphere/ellipsoid
analytically (direct assignment — the grid IS the SDF, no optimization
needed, unlike the implicit-sdf MLP fit); ``mesh:<path>`` bakes the
exact winding-number/point-triangle signed distance at the lattice
verts (``ops/shape_loss.py``, replacing the reference's pysdf oracle).

Sign convention: kaolin/DMTet inside-positive (reference isosurface.py
feeds ``-sdf``? No — the reference's ImplicitSDF is inside-negative and
``isosurface`` negates via forward_level; the raw grid here stores
inside-POSITIVE values so marching_tets_fixed needs no flip).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.ops import dmtet
from dreammat_tpu.ops import hashgrid as hg
from dreammat_tpu.ops import mlp as mlp_lib
from dreammat_tpu.utils.base import BaseObject


@dreammat_tpu.register("tetrahedra-sdf-grid")
class TetrahedraSDFGrid(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        isosurface_resolution: int = 128
        isosurface_deformable_grid: bool = True
        # fixed marching budget: max crossing tets kept per extraction
        max_crossing_tets: int = 1 << 17
        n_input_dims: int = 3
        n_feature_dims: int = 3
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
                "otype": "VanillaMLP", "activation": "ReLU",
                "output_activation": "none",
                "n_neurons": 64, "n_hidden_layers": 1,
            }
        )
        shape_init: Optional[str] = None  # "sphere" | "ellipsoid" | "mesh:<path>"
        shape_init_params: Any = 0.5
        geometry_only: bool = False
        fix_geometry: bool = False
        # reference config parity (outlier removal is a host-side export
        # cleanup; not needed for the fixed-budget soup):
        isosurface_remove_outliers: bool = False
        isosurface_outlier_n_faces_threshold: Any = 0.01
        force_shape_init: bool = False
        shape_init_mesh_up: str = "+z"
        shape_init_mesh_front: str = "+x"

    cfg: Config
    is_explicit_mesh: bool = True

    def configure(self) -> None:
        cfg = self.cfg
        lat = dmtet.build_tet_lattice(cfg.isosurface_resolution)
        r = cfg.radius
        self.lattice_verts = jnp.asarray(lat.verts) * (2 * r) - r  # [-r, r]
        self.tets = jnp.asarray(lat.tets)
        self.grid_cell = 2 * r / cfg.isosurface_resolution
        self.bbox = jnp.asarray([[-r] * 3, [r] * 3], jnp.float32)
        if not cfg.geometry_only:
            pc = dict(cfg.pos_encoding_config)
            pc.pop("otype", None)
            self.enc_cfg = hg.HashGridConfig(n_input_dims=cfg.n_input_dims, **pc)
            nc = cfg.mlp_network_config
            self.feature_dims = mlp_lib.vanilla_mlp_dims(
                self.enc_cfg.n_output_dims, cfg.n_feature_dims,
                n_neurons=nc.get("n_neurons", 64),
                n_hidden_layers=nc.get("n_hidden_layers", 1),
            )
        else:
            self.feature_dims = None
        self.mesh = None

    # -- params --------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        k1, k2 = jax.random.split(rng)
        Nv = self.lattice_verts.shape[0]
        if cfg.shape_init in ("sphere", "ellipsoid"):
            # grid IS the SDF: assign analytically (inside-positive)
            p = np.asarray(
                cfg.shape_init_params
                if hasattr(cfg.shape_init_params, "__len__")
                else [cfg.shape_init_params] * 3,
                np.float32,
            )
            v = np.asarray(self.lattice_verts)
            sdf0 = 1.0 - np.linalg.norm(v / p, axis=-1)
            # rescale to metric-ish units so zero crossings land right
            sdf = jnp.asarray(sdf0 * float(np.min(p)), jnp.float32)
        elif cfg.shape_init is None:
            # small random init around zero (reference zeros + later init;
            # pure zeros would have NO crossings at all)
            sdf = 0.1 * jax.random.normal(k1, (Nv,))
        elif cfg.shape_init.startswith("mesh:"):
            # one-time exact SDF bake at the lattice verts (winding-number
            # sign + point-triangle distance), replacing the reference's
            # pysdf oracle (tetrahedra_sdf_grid.py mesh branch); this
            # geometry is inside-POSITIVE (kaolin sign)
            from dreammat_tpu.models.mesh import load_mesh
            from dreammat_tpu.ops.shape_loss import mesh_signed_distance

            m = load_mesh(
                cfg.shape_init[5:],
                scale=float(
                    cfg.shape_init_params
                    if not hasattr(cfg.shape_init_params, "__len__")
                    else cfg.shape_init_params[0]
                ),
                mesh_up=cfg.shape_init_mesh_up,
                mesh_front=cfg.shape_init_mesh_front,
            )
            tri = m.v_pos[m.t_pos_idx]
            sdf = mesh_signed_distance(
                self.lattice_verts, tri, inside_positive=True
            )
        else:
            raise ValueError(f"Unknown shape initialization type: {cfg.shape_init!r}")
        params: Dict[str, Any] = {"sdf": sdf}
        if cfg.isosurface_deformable_grid and not cfg.fix_geometry:
            params["deformation"] = jnp.zeros((Nv, 3))
        if self.feature_dims is not None:
            params["table"] = hg.init_hashgrid(k2, self.enc_cfg)
            params["feature_mlp"] = mlp_lib.init_mlp(
                jax.random.fold_in(k2, 1), self.feature_dims
            )
        return params

    # -- surface -------------------------------------------------------------
    def isosurface(self, params: Dict[str, Any]) -> dmtet.MTOutput:
        cfg = self.cfg
        verts = self.lattice_verts
        if "deformation" in params:
            # bounded deformation: < half a cell keeps tets un-inverted
            # (reference scales by the lattice spacing too)
            verts = verts + 0.45 * self.grid_cell * jnp.tanh(params["deformation"])
        sdf = params["sdf"]
        if cfg.fix_geometry:
            sdf = jax.lax.stop_gradient(sdf)
            verts = jax.lax.stop_gradient(verts)
        return dmtet.marching_tets_fixed(
            sdf, verts, self.tets, cfg.max_crossing_tets
        )

    # -- field queries (features on/near the surface) ------------------------
    def export_features(self, params: Dict[str, Any], points: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = (points - self.bbox[0]) / (self.bbox[1] - self.bbox[0])
        x = jnp.clip(x, 0.0, 1.0)
        enc = hg.hashgrid_encode(params["table"], x.reshape(-1, 3), self.enc_cfg)
        return mlp_lib.apply_mlp(params["feature_mlp"], enc).reshape(
            *points.shape[:-1], cfg.n_feature_dims
        )

    def export(self, params: Dict[str, Any], points: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.feature_dims is None:
            return {}
        return {"features": self.export_features(params, points)}

    # -- host-side mesh extraction (export path) -----------------------------
    def isosurface_mesh(self, params: Dict[str, Any]):
        """Host extraction through the shared marching-tets tooling (same
        level set, shared-vertex output for OBJ export)."""
        from dreammat_tpu.ops.marching import marching_tets_grid

        cfg = self.cfg
        res = cfg.isosurface_resolution + 1
        r = cfg.radius
        xs = np.linspace(-r, r, res, dtype=np.float32)
        field = -np.asarray(params["sdf"], np.float32).reshape(res, res, res)
        return marching_tets_grid(field, xs)
