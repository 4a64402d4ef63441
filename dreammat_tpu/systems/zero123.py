"""Zero123 systems: single-image-to-3D via novel-view guidance.

TPU-native rebuilds of
``zero123-system`` (/root/reference/threestudio_dreammat/threestudio/
systems/zero123.py:17-390) and ``zero123-simple-system``
(.../systems/zero123_simple.py:11-207).

The reference runs two Lightning "substeps" per optimizer step — reference
-view photometric supervision and zero123 SDS on a random view — each with
its own renderer invocation and python-side boolean-mask losses. Here BOTH
substeps trace into ONE jitted train step:

- substep gating (``freq.ref_or_zero123`` accumulate/alternate,
  zero123.py:224-238) becomes two traced 0/1 weights computed on host per
  step — no recompiles, alternate mode just zeroes one branch;
- the masked depth/normal losses (zero123.py:102-134) are rewritten as
  mask-weighted closed forms: the depth scale/shift lstsq is a 2x2
  normal-equation solve under the mask (stop-gradient, like the
  reference's ``torch.linalg.lstsq`` under no_grad), the relative-depth
  Pearson and the normal cosine are mask-weighted moments — no boolean
  indexing, fixed shapes, TPU-friendly;
- shading augmentation: the reference threads ``ambient_ratio`` (1.0 on
  the reference view, random in [ambient_ratio_min, 1] on guidance
  views, zero123.py:62-73) through the renderer into the material. Here
  the diffuse-point-light material owns that augmentation
  (``soft_shading`` samples the ambient/diffuse mix per step inside the
  jit) — ``ambient_ratio_min`` is accepted for config parity and the
  randomization is delegated to the material.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import optax

import dreammat_tpu
from dreammat_tpu.systems.dreamfusion import DreamFusion, binary_cross_entropy
from dreammat_tpu.utils.schedule import C_jax


def masked_mean(x, m, eps=1e-8):
    return jnp.sum(x * m) / (jnp.sum(m) + eps)


def masked_pearson(x, y, m, eps=1e-8):
    """Pearson r of x, y over mask m (all flat arrays)."""
    mx = masked_mean(x, m)
    my = masked_mean(y, m)
    vx = masked_mean((x - mx) ** 2, m)
    vy = masked_mean((y - my) ** 2, m)
    cov = masked_mean((x - mx) * (y - my), m)
    return cov / (jnp.sqrt(vx * vy) + eps)


def masked_depth_align(gt, pred, m, eps=1e-6):
    """Scale/shift-align gt to pred under mask via the 2x2 normal equations
    (the reference's masked ``torch.linalg.lstsq``, zero123.py:105-113);
    the solve is stop-gradiented like the reference's no_grad block."""
    s_m = jnp.sum(m) + eps
    s_g = jnp.sum(m * gt)
    s_gg = jnp.sum(m * gt * gt)
    s_p = jnp.sum(m * pred)
    s_gp = jnp.sum(m * gt * pred)
    det = s_gg * s_m - s_g * s_g
    a = (s_gp * s_m - s_g * s_p) / (det + eps)
    b = (s_gg * s_p - s_g * s_gp) / (det + eps)
    a = jax.lax.stop_gradient(a)
    b = jax.lax.stop_gradient(b)
    return a * gt + b


@dreammat_tpu.register("zero123-system")
class Zero123(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        guidance_type: str = "zero123-guidance"
        freq: dict = field(default_factory=dict)
        refinement: bool = False
        ambient_ratio_min: float = 0.5
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 0.1,
            "lambda_rgb": 500.0,
            "lambda_mask": 50.0,
            "lambda_depth": 0.0,
            "lambda_depth_rel": 0.0,
            "lambda_normal": 0.0,
            "lambda_normal_smooth": 0.0,
            "lambda_3d_normal_smooth": 0.0,
            "lambda_orient": 1.0,
            "lambda_sparsity": 0.5,
            "lambda_opaque": 0.5,
        })

    cfg: Config

    def configure(self) -> None:
        if self.cfg.refinement:
            # refinement stage (zero123.py:197-208): DMTet mesh through the
            # differentiable rasterizer; regularizers switch from
            # orient/sparsity/opaque to mesh normal consistency
            if self.cfg.geometry_type == "implicit-volume":
                self.cfg.geometry_type = "tetrahedra-sdf-grid"
            if self.cfg.renderer_type == "nerf-volume-renderer":
                self.cfg.renderer_type = "nvdiff-rasterizer"
        super().configure()

    def on_fit_start(self, rng: jax.Array, latent_hw=None) -> None:
        # no prompt processor (reference zero123.py:37-40)
        if self.guidance is None:
            self.guidance = dreammat_tpu.find(self.cfg.guidance_type)(
                self.cfg.guidance
            )
            self.guidance.init_params(rng)

    def _substep_flags(self, it: int):
        """accumulate/alternate schedule (zero123.py:224-238) -> (w_ref,
        w_zero123) floats for the traced step."""
        freq = dict(self.cfg.freq or {})
        mode = freq.get("ref_or_zero123", "accumulate")
        if mode == "accumulate":
            return 1.0, 1.0
        ref_only_steps = int(freq.get("ref_only_steps", 0))
        n_ref = max(int(freq.get("n_ref", 1)), 1)
        do_ref = it < ref_only_steps or it % n_ref == 0
        return (1.0, 0.0) if do_ref else (0.0, 1.0)

    # image-condition-dreamfusion-system reuses this exact step with a
    # prompted guidance (see ImageConditionDreamFusion below)
    _prompted = False

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        prompt_utils = self.prompt_utils if self._prompted else None
        refinement = self.cfg.refinement
        has_depth = loss_cfg.get("lambda_depth", 0.0) or loss_cfg.get(
            "lambda_depth_rel", 0.0
        )

        def train_step(state, guidance_params,
                       # reference-view batch
                       ref_rays_o, ref_rays_d, ref_light, gt_rgb, gt_mask,
                       gt_depth, gt_normal,
                       # random-camera batch
                       z_rays_o, z_rays_d, z_light, elevation, azimuth,
                       camera_distances,
                       w_ref, w_z, height, width, z_height, z_width, rng):
            step = state["step"]
            k_ref, k_z, k_guide = jax.random.split(rng, 3)

            def loss_fn(params):
                metrics = {}
                loss = 0.0

                # ---- BOTH substeps in ONE batched render dispatch ----
                # The reference renders the two views sequentially; the
                # sample grids are identical fixed shapes, so concatenating
                # the ray sets doubles the per-dispatch batch (better MXU/
                # VPU utilization, halves launch overhead) and splitting
                # the ray-dim outputs recovers the substeps exactly.
                n_ref = ref_rays_o.shape[0]
                out_all = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    jnp.concatenate([ref_rays_o, z_rays_o]),
                    jnp.concatenate([ref_rays_d, z_rays_d]),
                    jnp.concatenate([ref_light, z_light]),
                    k_ref, step=step, is_train=True,
                )
                n_all = n_ref + z_rays_o.shape[0]
                out_r, out_z = {}, {}
                for key, val in out_all.items():
                    if hasattr(val, "shape") and val.ndim >= 1 and \
                            val.shape[0] == n_all:
                        out_r[key] = val[:n_ref]
                        out_z[key] = val[n_ref:]
                    else:
                        out_r[key] = val
                        out_z[key] = val

                # ---- reference-view substep (zero123.py:89-134) ----
                m = gt_mask.reshape(-1)
                # gt composited over the model's own background (:93-97)
                gt_c = gt_rgb.reshape(-1, 3) * m[:, None] + \
                    out_r["comp_rgb_bg"] * (1.0 - m[:, None])
                loss_rgb = jnp.mean((gt_c - out_r["comp_rgb"]) ** 2)
                loss_mask = jnp.mean((m - out_r["opacity"][:, 0]) ** 2)
                loss = loss + w_ref * (
                    C_jax(loss_cfg.get("lambda_rgb", 0.0), step) * loss_rgb
                    + C_jax(loss_cfg.get("lambda_mask", 0.0), step) * loss_mask
                )
                metrics["loss_rgb"] = loss_rgb
                metrics["loss_mask"] = loss_mask

                if gt_depth is not None and has_depth:
                    gd = gt_depth.reshape(-1)
                    pd = out_r["depth"][:, 0]
                    aligned = masked_depth_align(gd, pd, m)
                    loss_depth = masked_mean((aligned - pd) ** 2, m)
                    loss = loss + w_ref * C_jax(
                        loss_cfg.get("lambda_depth", 0.0), step) * loss_depth
                    loss_depth_rel = 1.0 - masked_pearson(pd, gd, m)
                    loss = loss + w_ref * C_jax(
                        loss_cfg.get("lambda_depth_rel", 0.0), step
                    ) * loss_depth_rel
                    metrics["loss_depth"] = loss_depth
                    metrics["loss_depth_rel"] = loss_depth_rel
                if gt_normal is not None and loss_cfg.get("lambda_normal", 0.0):
                    gn = 1.0 - 2.0 * gt_normal.reshape(-1, 3)  # (:121-127)
                    pn = 2.0 * out_r["comp_normal"] - 1.0
                    cos = jnp.sum(gn * pn, axis=-1) / (
                        jnp.linalg.norm(gn, axis=-1)
                        * jnp.linalg.norm(pn, axis=-1) + 1e-8
                    )
                    loss_normal = 1.0 - masked_mean(cos, m)
                    loss = loss + w_ref * C_jax(
                        loss_cfg.get("lambda_normal", 0.0), step) * loss_normal
                    metrics["loss_normal"] = loss_normal

                # ---- zero123 SDS substep (zero123.py:135-144) ----
                rgb = out_z["comp_rgb"].reshape(1, z_height, z_width, 3)
                if prompt_utils is not None:
                    gout = guidance(
                        guidance_params, rgb, prompt_utils, elevation,
                        azimuth, camera_distances, step=step, rng=k_guide,
                    )
                else:
                    gout = guidance(
                        guidance_params, rgb, elevation, azimuth,
                        camera_distances, step=step, rng=k_guide,
                    )
                loss = loss + w_z * C_jax(
                    loss_cfg.get("lambda_sds", 1.0), step) * gout["loss_sds"]
                metrics["loss_sds"] = gout["loss_sds"]

                # ---- shared regularizers (zero123.py:146-195) ----
                lam = C_jax(loss_cfg.get("lambda_normal_smooth", 0.0), step)
                if "comp_normal" in out_z:
                    nimg = out_z["comp_normal"].reshape(z_height, z_width, 3)
                    loss_ns = (
                        jnp.mean((nimg[1:, :] - nimg[:-1, :]) ** 2)
                        + jnp.mean((nimg[:, 1:] - nimg[:, :-1]) ** 2)
                    )
                    loss = loss + w_z * lam * loss_ns
                    metrics["loss_normal_smooth"] = loss_ns
                if "normal_perturb" in out_z:
                    loss_3d = jnp.mean(
                        jnp.abs(out_z["normal"] - out_z["normal_perturb"])
                    )
                    loss = loss + w_z * C_jax(
                        loss_cfg.get("lambda_3d_normal_smooth", 0.0), step
                    ) * loss_3d
                    metrics["loss_3d_normal_smooth"] = loss_3d
                if not refinement:
                    # volume-stage regularizers (zero123.py:166-195)
                    if "weights" in out_z and "normal" in out_z:
                        wgt = jax.lax.stop_gradient(out_z["weights"])
                        ndv = jnp.sum(out_z["normal"] * out_z["t_dirs"], axis=-1)
                        loss_orient = jnp.sum(
                            wgt * jnp.clip(ndv, 0.0, None) ** 2
                        ) / jnp.maximum(jnp.sum(out_z["opacity"] > 0), 1)
                        loss = loss + w_z * C_jax(
                            loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                        metrics["loss_orient"] = loss_orient
                    loss_sparsity = jnp.sqrt(out_z["opacity"] ** 2 + 0.01).mean()
                    loss = loss + w_z * C_jax(
                        loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                    oc = jnp.clip(out_z["opacity"], 1e-3, 1.0 - 1e-3)
                    loss_opaque = binary_cross_entropy(oc, oc)
                    loss = loss + w_z * C_jax(
                        loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                    metrics["loss_sparsity"] = loss_sparsity
                    metrics["loss_opaque"] = loss_opaque
                else:
                    # refinement: mesh normal consistency (zero123.py:197-204;
                    # the laplacian variant needs shared-vertex adjacency —
                    # covered by the same edge-gid smoothness pressure)
                    from dreammat_tpu.ops import dmtet as dmtet_ops

                    mesh = out_z["mesh"]
                    loss_nc = dmtet_ops.normal_consistency(
                        mesh.tri_verts, mesh.valid, mesh.edge_gid
                    )
                    loss = loss + w_z * C_jax(
                        loss_cfg.get("lambda_normal_consistency", 0.0), step
                    ) * loss_nc
                    metrics["loss_normal_consistency"] = loss_nc

                metrics["loss"] = loss
                metrics["grad_norm"] = gout["grad_norm"]
                metrics["min_step"] = gout["min_step"]
                metrics["max_step"] = gout["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"]}
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt"], params)
            new_params = optax.apply_updates(params, updates)
            return {
                "geo": new_params["geo"], "bg": new_params["bg"],
                "opt": new_opt, "render": state["render"], "step": step + 1,
            }, metrics

        return jax.jit(
            train_step,
            static_argnames=("height", "width", "z_height", "z_width"),
        )

    def _apply_train_step(self, state, batch, rng):
        rc = batch["random_camera"]
        it = int(state["step"])
        w_ref, w_z = self._substep_flags(it)
        return self._train_step_fn(
            state, self.guidance.params,
            batch["rays_o"], batch["rays_d"], batch["light_positions"],
            batch["rgb"], batch["mask"],
            batch.get("ref_depth"), batch.get("ref_normal"),
            rc["rays_o"], rc["rays_d"], rc["light_positions"],
            rc["elevation"], rc["azimuth"], rc["camera_distances"],
            jnp.float32(w_ref), jnp.float32(w_z),
            batch["height"], batch["width"], rc["height"], rc["width"], rng,
        )


@dreammat_tpu.register("zero123-simple-system")
class Zero123Simple(DreamFusion):
    """SDS-only variant (zero123_simple.py:11-207): random-view zero123
    guidance + orient/2D-normal-smooth/sparsity/opaque regularizers, no
    reference-view photometric supervision."""

    @dataclass
    class Config(DreamFusion.Config):
        guidance_type: str = "zero123-guidance"
        # accepted for shared-config parity with zero123-system
        freq: dict = field(default_factory=dict)
        ambient_ratio_min: float = 0.5
        refinement: bool = False
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 0.1,
            "lambda_orient": 1.0,
            "lambda_normal_smoothness_2d": 0.0,
            "lambda_sparsity": 0.5,
            "lambda_opaque": 0.5,
        })

    cfg: Config

    def on_fit_start(self, rng: jax.Array, latent_hw=None) -> None:
        if self.guidance is None:
            self.guidance = dreammat_tpu.find(self.cfg.guidance_type)(
                self.cfg.guidance
            )
            self.guidance.init_params(rng)

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer

        def train_step(state, guidance_params, rays_o, rays_d,
                       light_positions, height, width, elevation, azimuth,
                       camera_distances, rng):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True,
                )
                rgb = out["comp_rgb"].reshape(1, height, width, 3)
                gout = guidance(
                    guidance_params, rgb, elevation, azimuth,
                    camera_distances, step=step, rng=k_guide,
                )
                loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * gout["loss_sds"]
                metrics = {"loss_sds": gout["loss_sds"]}
                if "normal" in out:
                    w = jax.lax.stop_gradient(out["weights"])
                    ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                    loss_orient = jnp.sum(
                        w * jnp.clip(ndv, 0.0, None) ** 2
                    ) / jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                    loss = loss + C_jax(
                        loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                    metrics["loss_orient"] = loss_orient
                if "comp_normal" in out and loss_cfg.get(
                        "lambda_normal_smoothness_2d", 0.0):
                    nimg = out["comp_normal"].reshape(height, width, 3)
                    loss_ns = (
                        jnp.mean((nimg[1:, :] - nimg[:-1, :]) ** 2)
                        + jnp.mean((nimg[:, 1:] - nimg[:, :-1]) ** 2)
                    )
                    loss = loss + C_jax(
                        loss_cfg["lambda_normal_smoothness_2d"], step) * loss_ns
                    metrics["loss_normal_smoothness_2d"] = loss_ns
                loss_sparsity = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
                loss = loss + C_jax(
                    loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                oc = jnp.clip(out["opacity"], 1e-3, 1.0 - 1e-3)
                loss_opaque = binary_cross_entropy(oc, oc)
                loss = loss + C_jax(
                    loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                metrics["loss_sparsity"] = loss_sparsity
                metrics["loss_opaque"] = loss_opaque
                metrics["loss"] = loss
                metrics["grad_norm"] = gout["grad_norm"]
                metrics["min_step"] = gout["min_step"]
                metrics["max_step"] = gout["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"]}
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt"], params)
            new_params = optax.apply_updates(params, updates)
            return {
                "geo": new_params["geo"], "bg": new_params["bg"],
                "opt": new_opt, "render": state["render"], "step": step + 1,
            }, metrics

        return jax.jit(train_step, static_argnames=("height", "width"))

    def _apply_train_step(self, state, batch, rng):
        rc = batch.get("random_camera", batch)
        return self._train_step_fn(
            state, self.guidance.params, rc["rays_o"], rc["rays_d"],
            rc["light_positions"], rc["height"], rc["width"],
            rc["elevation"], rc["azimuth"], rc["camera_distances"], rng,
        )


@dreammat_tpu.register("image-condition-dreamfusion-system")
class ImageConditionDreamFusion(Zero123):
    """Single-image DreamFusion (reference
    .../systems/imagedreamfusion.py:17-387): the exact zero123-system
    substep structure — reference-view photometric losses + guided random
    view + shared regularizers — but the guidance is the *prompted*
    stable-diffusion SDS instead of the image-conditioned zero123 model.
    Implemented as the Zero123 step with ``prompt_utils`` threaded in."""

    _prompted = True

    @dataclass
    class Config(Zero123.Config):
        guidance_type: str = "stable-diffusion-guidance"

    cfg: Config

    def on_fit_start(self, rng: jax.Array, latent_hw=None) -> None:
        # prompted path: build guidance AND prompt processor (the reference
        # builds both, imagedreamfusion.py:36-42) — DreamFusion's base hook
        DreamFusion.on_fit_start(self, rng, latent_hw=latent_hw)
