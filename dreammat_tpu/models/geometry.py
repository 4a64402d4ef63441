"""DreamMat geometry: frozen mesh + learnable material field.

TPU-native rebuild of ``DreamMatMesh``
(/root/reference/threestudio_dreammat/threestudio/models/geometry/
dreammat_mesh.py:89-274): a hash-grid encoding + small MLP mapping 3D points
(or 2D UVs) to ``n_feature_dims`` raw material features
(albedo 3 + metallic 1 + roughness² 1). The mesh itself is frozen; the only
trainable state is the field, exposed as a pytree via ``init``/``apply``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.mesh import Mesh, load_mesh
from dreammat_tpu.ops import hashgrid as hg
from dreammat_tpu.ops import mlp as mlp_lib
from dreammat_tpu.utils.base import BaseObject


@dreammat_tpu.register("dreammat-mesh")
class DreamMatMesh(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        n_input_dims: int = 3
        n_feature_dims: int = 5
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
        shape_init: str = "???"
        shape_init_params: Optional[Any] = None
        shape_init_mesh_up: str = "+z"
        shape_init_mesh_front: str = "+x"

    cfg: Config

    def configure(self) -> None:
        pc = dict(self.cfg.pos_encoding_config)
        pc.pop("otype", None)
        self.enc_cfg = hg.HashGridConfig(n_input_dims=self.cfg.n_input_dims, **pc)
        nc = self.cfg.mlp_network_config
        self.mlp_dims = mlp_lib.vanilla_mlp_dims(
            self.enc_cfg.n_output_dims,
            self.cfg.n_feature_dims,
            n_neurons=nc.get("n_neurons", 64),
            n_hidden_layers=nc.get("n_hidden_layers", 1),
        )
        # bbox over which field inputs are normalized to (0,1)
        r = self.cfg.radius
        self.bbox3d = jnp.asarray([[-r, -r, -r], [r, r, r]], dtype=jnp.float32)
        self.bbox2d = jnp.asarray([[0.0, 0.0], [1.0, 1.0]], dtype=jnp.float32)

        self.mesh: Optional[Mesh] = None
        if isinstance(self.cfg.shape_init, str) and self.cfg.shape_init.startswith("mesh:"):
            path = self.cfg.shape_init[5:]
            scale = self.cfg.shape_init_params
            self.mesh = load_mesh(
                path,
                scale=float(scale) if scale is not None else None,
                mesh_up=self.cfg.shape_init_mesh_up,
                mesh_front=self.cfg.shape_init_mesh_front,
            )
        elif isinstance(self.cfg.shape_init, str) and self.cfg.shape_init.startswith("procedural:"):
            # hermetic runs without a mesh asset (smoke tests, proof kits)
            kind = self.cfg.shape_init.split(":", 1)[1]
            from dreammat_tpu.models.mesh import make_icosphere

            if kind != "sphere":
                raise ValueError(f"unknown procedural shape '{kind}'")
            level = int(self.cfg.shape_init_params or 2)
            self.mesh = make_icosphere(level)

    def set_mesh(self, mesh: Mesh) -> None:
        self.mesh = mesh

    def isosurface(self) -> Mesh:
        if self.mesh is None:
            raise ValueError("mesh not initialized (shape_init missing)")
        return self.mesh

    # -- learnable field ----------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        return {
            "table": hg.init_hashgrid(k1, self.enc_cfg),
            "mlp": mlp_lib.init_mlp(k2, self.mlp_dims),
        }

    def apply(self, params: Dict[str, Any], points: jnp.ndarray) -> jnp.ndarray:
        """points: [..., n_input_dims] world coords (3D) or uv (2D) ->
        raw features [..., n_feature_dims] (pre-activation)."""
        bbox = self.bbox3d if self.cfg.n_input_dims == 3 else self.bbox2d
        x = (points - bbox[0]) / (bbox[1] - bbox[0])
        x = jnp.clip(x, 0.0, 1.0)
        enc = hg.hashgrid_encode(params["table"], x, self.enc_cfg)
        return mlp_lib.apply_mlp(params["mlp"], enc)

    # -- view-static encode (scatter-free table backward) --------------------
    def build_static_maps(self, points: jnp.ndarray) -> hg.EncodeMaps:
        """One-time per (view, query-set) sort structure for fixed query
        points — enables hashgrid_encode_static's scatter-free backward
        (ops/hashgrid.py). Points are normalized exactly like apply()."""
        bbox = self.bbox3d if self.cfg.n_input_dims == 3 else self.bbox2d
        x = (points - bbox[0]) / (bbox[1] - bbox[0])
        return hg.build_encode_maps(jnp.clip(x, 0.0, 1.0), self.enc_cfg)

    def apply_static(self, params: Dict[str, Any], maps: hg.EncodeMaps) -> jnp.ndarray:
        """apply() for fixed points via precomputed maps: identical features,
        ~14x faster table gradient on TPU (931 ms -> ~65 ms measured)."""
        enc = hg.hashgrid_encode_static(params["table"], maps, self.enc_cfg)
        return mlp_lib.apply_mlp(params["mlp"], enc)

    def export(self, params: Dict[str, Any], points: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {"features": self.apply(params, points)}


@dreammat_tpu.register("custom-mesh")
class CustomMesh(DreamMatMesh):
    """Fixed user mesh + trainable feature field.

    The reference's ``custom-mesh``
    (/root/reference/threestudio_dreammat/threestudio/models/geometry/
    custom_mesh.py:22-192) is exactly this framework's DreamMat mesh
    geometry — a loaded, normalized triangle mesh with a hashgrid+MLP
    feature field queried at surface points — so it registers as an alias
    (same loaders replace the reference's trimesh dependency)."""
