"""Implicit SDF geometry: hashgrid + MLP signed-distance field.

TPU-native rebuild of ``ImplicitSDF``
(/root/reference/threestudio_dreammat/threestudio/models/geometry/
implicit_sdf.py:17-335): an encoding + small MLP emitting a signed distance
(negative inside), an optional feature head, analytic ``sdf_bias``
("sphere" / "ellipsoid" / constant, :229-248) so optimization starts from a
closed shape, and finite-difference / analytic normals where the
*unnormalized* gradient is also returned for the eikonal loss.

``initialize_shape`` (:91-227) — the reference's pysdf/trimesh pretraining
loop — is a pure-JAX Adam fit against the target SDF; the ``mesh:``
target uses the exact winding-number + point-triangle oracle in
``ops/shape_loss.py`` instead of pysdf (same normalization and the same
negative-inside sign, implicit_sdf.py:127-194).
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


@dreammat_tpu.register("implicit-sdf")
class ImplicitSDF(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        n_input_dims: int = 3
        n_feature_dims: int = 3
        # float | "sphere" | "ellipsoid"; analytic pre-activation bias
        sdf_bias: Any = 0.0
        sdf_bias_params: Any = 0.5
        shape_init: Optional[str] = None  # "sphere" | "ellipsoid" | "mesh:<path>"
        shape_init_params: Any = 0.5
        shape_init_steps: int = 400
        shape_init_mesh_up: str = "+z"
        shape_init_mesh_front: str = "+x"
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
        normal_type: str = "finite_difference"  # | "analytic"
        finite_difference_normal_eps: float = 0.01
        isosurface_resolution: int = 96
        isosurface_threshold: float = 0.0  # level set (0 = the surface)

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
        self.sdf_dims = dims(1)
        self.feature_dims = dims(self.cfg.n_feature_dims) if self.cfg.n_feature_dims > 0 else None
        r = self.cfg.radius
        self.bbox = jnp.asarray([[-r, -r, -r], [r, r, r]], dtype=jnp.float32)
        self.mesh = None

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        ks = jax.random.split(rng, 2)
        p = {
            "table": hg.init_hashgrid(ks[0], self.enc_cfg),
            "sdf_mlp": mlp_lib.init_mlp(ks[1], self.sdf_dims),
        }
        if self.feature_dims is not None:
            p["feature_mlp"] = mlp_lib.init_mlp(
                jax.random.fold_in(rng, 2), self.feature_dims
            )
        return p

    # -- field ---------------------------------------------------------------
    def _encode(self, params, points):
        x = (points - self.bbox[0]) / (self.bbox[1] - self.bbox[0])
        x = jnp.clip(x, 0.0, 1.0)
        return hg.hashgrid_encode(params["table"], x.reshape(-1, 3), self.enc_cfg)

    def _sdf_bias(self, points):
        """Analytic closed-shape bias (implicit_sdf.py:229-248)."""
        b = self.cfg.sdf_bias
        if b == "sphere":
            r = float(self.cfg.sdf_bias_params)
            return jnp.linalg.norm(points, axis=-1, keepdims=True) - r
        if b == "ellipsoid":
            size = jnp.asarray(self.cfg.sdf_bias_params, jnp.float32)
            return jnp.sqrt(
                jnp.sum((points / size) ** 2, axis=-1, keepdims=True)
            ) - 1.0
        return jnp.float32(b)

    def forward_sdf(self, params: Dict[str, Any], points: jnp.ndarray) -> jnp.ndarray:
        """points [..., 3] -> signed distance [..., 1] (negative inside)."""
        enc = self._encode(params, points)
        raw = mlp_lib.apply_mlp(params["sdf_mlp"], enc).reshape(*points.shape[:-1], 1)
        return raw + self._sdf_bias(points)

    def apply(
        self, params: Dict[str, Any], points: jnp.ndarray, output_normal: bool = False
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        enc = self._encode(params, points)
        sdf = mlp_lib.apply_mlp(params["sdf_mlp"], enc).reshape(*points.shape[:-1], 1)
        sdf = sdf + self._sdf_bias(points)
        out = {"sdf": sdf}
        if self.feature_dims is not None:
            out["features"] = mlp_lib.apply_mlp(params["feature_mlp"], enc).reshape(
                *points.shape[:-1], cfg.n_feature_dims
            )
        if output_normal:
            if cfg.normal_type == "finite_difference":
                eps = cfg.finite_difference_normal_eps
                offs = jnp.asarray(
                    [[eps, 0, 0], [0, eps, 0], [0, 0, eps]], jnp.float32
                )
                po = jnp.clip(points[..., None, :] + offs, -cfg.radius, cfg.radius)
                so = self.forward_sdf(params, po)  # [..., 3, 1]
                grad = (so[..., :, 0] - sdf) / eps  # forward difference
            elif cfg.normal_type == "analytic":
                flat = points.reshape(-1, 3)
                grad = jax.vmap(
                    jax.grad(lambda p: self.forward_sdf(params, p[None])[0, 0])
                )(flat).reshape(*points.shape[:-1], 3)
            else:
                raise ValueError(f"unknown normal type {cfg.normal_type}")
            # SDF grows outward: normal IS the normalized gradient; the raw
            # gradient feeds the eikonal loss (textmesh.py:76-80)
            out["sdf_grad"] = grad
            normal = safe_normalize(grad)
            out["normal"] = normal
            out["shading_normal"] = normal
        return out

    # -- shape init ------------------------------------------------------------
    def initialize_shape(self, params: Dict[str, Any], rng: jax.Array) -> Dict[str, Any]:
        """Fit the field to an analytic target SDF before optimization
        (implicit_sdf.py:91-227 semantics, JAX Adam instead of a torch loop).
        No-op when shape_init is None."""
        if self.cfg.shape_init is None:
            return params
        import optax

        if self.cfg.shape_init == "sphere":
            r = float(self.cfg.shape_init_params)
            target = lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - r
        elif self.cfg.shape_init == "ellipsoid":
            size = jnp.asarray(self.cfg.shape_init_params, jnp.float32)
            target = lambda p: jnp.sqrt(
                jnp.sum((p / size) ** 2, axis=-1, keepdims=True)
            ) - 1.0
        elif self.cfg.shape_init.startswith("mesh:"):
            # exact winding-number/point-triangle SDF oracle in place of
            # the reference's pysdf (implicit_sdf.py:127-194); same
            # normalization: centroid-center, up/front->+z/+x, max |coord|
            # scaled to shape_init_params, negative inside
            from dreammat_tpu.models.mesh import load_mesh
            from dreammat_tpu.ops.shape_loss import mesh_signed_distance

            m = load_mesh(
                self.cfg.shape_init[5:],
                scale=float(self.cfg.shape_init_params),
                mesh_up=self.cfg.shape_init_mesh_up,
                mesh_front=self.cfg.shape_init_mesh_front,
            )
            tri = m.v_pos[m.t_pos_idx]
            target = lambda p: mesh_signed_distance(
                p, tri, inside_positive=False, chunk=p.shape[0]
            )[:, None]
        else:
            raise ValueError(
                f"Unknown shape initialization type: {self.cfg.shape_init}"
            )

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def fit_step(params, opt_state, k):
            pts = jax.random.uniform(
                k, (4096, 3), minval=-self.cfg.radius, maxval=self.cfg.radius
            )

            def loss_fn(p):
                return jnp.mean((self.forward_sdf(p, pts) - target(pts)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        loss = None
        for i in range(self.cfg.shape_init_steps):
            params, opt_state, loss = fit_step(params, opt_state, jax.random.fold_in(rng, i))
        dreammat_tpu.info(
            "implicit-sdf shape init (%s): fit loss %.2e after %d steps",
            self.cfg.shape_init, float(loss), self.cfg.shape_init_steps,
        )
        return params

    # -- isosurface ------------------------------------------------------------
    def isosurface_mesh(self, params: Dict[str, Any]):
        """Zero level set via marching tets (sdf negative inside -> field =
        -sdf matches the marching convention positive-inside)."""
        from dreammat_tpu.ops.marching import marching_tets_grid

        import numpy as np

        res = self.cfg.isosurface_resolution
        r = self.cfg.radius
        xs = np.linspace(-r, r, res, dtype=np.float32)
        grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
        pts = jnp.asarray(grid.reshape(-1, 3))
        n = pts.shape[0]
        chunk = 1 << 18
        vals = []
        f = jax.jit(lambda p: self.forward_sdf(params, p)[..., 0])
        for i in range(0, n, chunk):
            end = min(i + chunk, n)
            pad = chunk - (end - i)
            block = jnp.pad(pts[i:end], ((0, pad), (0, 0)))
            vals.append(np.asarray(f(block))[: end - i])
        fld = -(np.concatenate(vals).reshape(res, res, res)
                - float(self.cfg.isosurface_threshold))
        return marching_tets_grid(fld, xs)

    def export(self, params: Dict[str, Any], points: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        if self.feature_dims is not None:
            enc = self._encode(params, points)
            out["features"] = mlp_lib.apply_mlp(params["feature_mlp"], enc).reshape(
                *points.shape[:-1], self.cfg.n_feature_dims
            )
        return out
