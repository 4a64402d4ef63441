"""DreamMat PBR material: Monte-Carlo Cook–Torrance GGX shading.

TPU-native rebuild of ``DreamMatMaterial``
(/root/reference/threestudio_dreammat/threestudio/models/materials/
dreammat_material.py:346-797). Semantics preserved:

- raw field features -> sigmoid -> albedo(3) in [0,1], metallic and
  *squared* roughness affinely mapped into configured ranges (forward, 727-743)
- cosine-weighted diffuse + GGX importance-sampled specular direction sets
  from fixed fibonacci points, with per-pixel random azimuth rotation during
  training (sample_*_directions, 554-596)
- combined-pdf specular estimator D*G/(4*NoV*p), diffuse estimator
  albedo * mean(L) over the cosine set (shade_raytracing, 615-677)
- incoming radiance: visibility ray -> 0 if blocked else equirect env
  lookup (get_lights, 490-507); env indexing matches
  get_envirmentlight_blender (439-455)
- split-sum fast path (shade_splitsum, 679-711) with a *computed* FG LUT
- material smoothness regularizer (material_smoothness_grad, 110-123)

All shading happens on fixed-size [P] pixel batches inside jit; the
visibility function is injected by the renderer (set_raytracer, 426).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.ops import envmap as envmap_lib
from dreammat_tpu.utils import ops as uops
from dreammat_tpu.utils.base import BaseObject


def material_smoothness_grad(material: jnp.ndarray, material_jitter: jnp.ndarray) -> jnp.ndarray:
    """Jitter-difference smoothness loss (dreammat_material.py:110-123)."""
    lambda_kd, lambda_ks = 0.25, 0.1
    kd_grad = jnp.abs(material[..., :3] - material_jitter[..., :3])
    ks_grad = jnp.abs(material[..., 3:5] - material_jitter[..., 3:5])
    kd_luma = (kd_grad[..., 0] + kd_grad[..., 1] + kd_grad[..., 2]) / 3.0
    loss = jnp.mean(kd_luma * kd_grad[..., -1]) * lambda_kd
    loss += jnp.mean(ks_grad[..., :-1] * ks_grad[..., -1:]) * lambda_ks
    return loss


def fresnel_schlick(F0, HoV):
    return F0 + (1.0 - F0) * jnp.clip(1.0 - HoV, 0.0, 1.0) ** 5.0


def distribution_ggx(NoH, roughness_sq):
    """GGX NDF; ``roughness_sq`` is alpha (the field predicts r^2)."""
    a2 = roughness_sq**2
    denom = NoH**2 * (a2 - 1.0) + 1.0
    return a2 / (jnp.pi * denom**2 + 1e-4)


def geometry_schlick_ggx(NoX, roughness_sq):
    k = roughness_sq / 2.0
    return NoX / (NoX * (1 - k) + k + 1e-5)


def geometry_schlick(NoV, NoL, roughness_sq):
    return geometry_schlick_ggx(NoV, roughness_sq) * geometry_schlick_ggx(NoL, roughness_sq)


def geometry_ggx_smith_correlated(NoV, NoL, roughness_sq):
    def lam(alpha2, cos_t):
        cos2 = cos_t**2
        tan2 = (1.0 - cos2) / (cos2 + 1e-7)
        return 0.5 * jnp.sqrt(1.0 + alpha2 * tan2) - 0.5

    alpha_sq = roughness_sq**2
    return 1.0 / (1.0 + lam(alpha_sq, NoV) + lam(alpha_sq, NoL))


def occlusion_nograd(trace_fn, o, d):
    """Shadow-ray hit mask as a vjp BLACK BOX.

    Occlusion is piecewise-constant in the ray (gradient zero almost
    everywhere; the reference's CUDA BVH is not differentiable either,
    raytracing_renderer.py:318-324). stop_gradient on the inputs is not
    enough: under a differentiated outer scan XLA still saved per-step
    caster intermediates (round-5 mc-raytrace train step asked for a
    32 GB [steps, rays, tri_chunk, 3] residual). custom_vjp guarantees
    the caster is never linearized — backward returns zero cotangents."""

    @jax.custom_vjp
    def f(o, d):
        _, _, _, hit = trace_fn(o, d)
        return hit

    def fwd(o, d):
        return f(o, d), (o.shape, o.dtype, d.shape, d.dtype)

    def bwd(res, ct):
        osh, odt, dsh, ddt = res
        return jnp.zeros(osh, odt), jnp.zeros(dsh, ddt)

    f.defvjp(fwd, bwd)
    return f(jax.lax.stop_gradient(o), jax.lax.stop_gradient(d))


@dreammat_tpu.register("dreammat-material")
class DreamMatMaterial(BaseObject):
    @dataclass
    class Config:
        material_activation: str = "sigmoid"
        environment_texture: str = "load/lights/envmap"
        environment_scale: float = 1.0
        n_environments: int = 5
        env_height: int = 256
        env_width: int = 512
        min_metallic: float = 0.0
        max_metallic: float = 0.9
        min_roughness_squre: float = 0.01
        max_roughness_squre: float = 0.9
        min_roughness: float = 0.1
        max_roughness: float = 0.95
        use_bump: bool = False
        splitsum_height: int = 128
        splitsum_width: int = 256
        diffuse_sample_num: int = 512
        specular_sample_num: int = 256
        geometry_type: str = "schlick"
        random_azimuth: bool = True
        use_raytracing: bool = True
        # >0: stream the MC estimator over direction chunks of this size
        # (lax.scan + remat). Avoids materializing [P, S, 3] intermediates,
        # which tile-pad catastrophically on TPU (3 -> 128 lanes). 0 = off.
        shading_chunk: int = 0
        # use the prerendered per-pixel visibility-aware split-sum tables
        # (data/prerender.py) when the renderer provides them: the per-step
        # shading becomes a table interpolation + FG-LUT fetch, removing all
        # per-step environment/visibility gathers. Fast training default;
        # exact per-step MC remains for eval/parity.
        use_prefiltered: bool = False

    cfg: Config

    def configure(self) -> None:
        self.requires_normal = True
        cfg = self.cfg

        # --- environment maps: load map{1..5}/map{1..5}.{hdr,exr} like the
        # reference (dreammat_material.py:379-386); fall back to procedural
        # skies when assets are absent so the pipeline runs hermetically.
        envs = []
        for i in range(cfg.n_environments):
            idx = str(i + 1)
            loaded = None
            for ext in (".exr", ".hdr"):
                p = os.path.join(cfg.environment_texture, f"map{idx}", f"map{idx}{ext}")
                if os.path.exists(p):
                    loaded = envmap_lib.load_envmap_file(p)
                    break
            if loaded is None:
                loaded = envmap_lib.make_procedural_envmap(
                    cfg.env_height,
                    cfg.env_width,
                    sun_dir=np.array(
                        [np.cos(i * 2.2), np.sin(i * 2.2), 0.6 + 0.1 * (i % 3)]
                    ),
                    sun_intensity=10.0 + 5.0 * i,
                    seed=i,
                )
            loaded = envmap_lib.resize_envmap(loaded, cfg.env_height, cfg.env_width)
            envs.append(loaded * cfg.environment_scale)
        self.envs = jnp.asarray(np.stack(envs))  # [E, H, W, 3]

        # split-sum stacks per env (fast path)
        self.splitsum = None  # built lazily (expensive; only for splitsum mode)
        self.fg_lut = None

        # fixed fibonacci direction sets scaled to unit square
        # (dreammat_material.py:389-398)
        az, el = uops.sample_sphere_fibonacci(cfg.diffuse_sample_num)
        self.diffuse_dir_samples = jnp.asarray(
            np.stack([az * 0.5 / np.pi, 1.0 - 2.0 * el / np.pi], -1), dtype=jnp.float32
        )
        az, el = uops.sample_sphere_fibonacci(cfg.specular_sample_num)
        self.specular_dir_samples = jnp.asarray(
            np.stack([az * 0.5 / np.pi, 1.0 - 2.0 * el / np.pi], -1), dtype=jnp.float32
        )

        self.ray_trace_fun: Optional[Callable] = None
        self.baked_visibility = None  # ops.visibility.BakedVisibility
        if cfg.use_prefiltered:
            # computed HERE (host context): building it lazily inside a
            # traced shade call would cache a leaked tracer on self
            self.fg_lut = envmap_lib.compute_fg_lut()

    def ensure_splitsum(self):
        if self.splitsum is None:
            ss = [
                envmap_lib.build_splitsum(
                    self.envs[i], self.cfg.splitsum_height, self.cfg.splitsum_width
                )
                for i in range(self.envs.shape[0])
            ]
            self.splitsum = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ss)
            self.fg_lut = envmap_lib.compute_fg_lut()

    def set_raytracer(self, fn: Callable) -> None:
        """fn(rays_o [N,3], rays_d [N,3]) -> (positions, normals, depth, hit_mask);
        miss encoded as depth>=10 (reference raytracing_renderer.py:318-324)."""
        self.ray_trace_fun = fn

    def set_baked_visibility(self, baked) -> None:
        """Use the PRT-style baked per-vertex visibility table
        (ops/visibility.py) instead of per-step shadow rays."""
        self.baked_visibility = baked

    # ------------------------------------------------------------------
    # direction sampling
    # ------------------------------------------------------------------
    def sample_diffuse_directions(self, normals, rng, is_train: bool):
        """Cosine-weighted hemisphere set in each normal's tangent frame
        (dreammat_material.py:554-573). normals [P,3] -> [P,S,3]."""
        z = normals
        x = uops.get_orthogonal_directions(normals)
        y = jnp.cross(z, x)
        az, el = self.diffuse_dir_samples[:, 0], self.diffuse_dir_samples[:, 1]
        az = az[None, :, None] * (2.0 * jnp.pi)
        el = el[None, :, None]
        if is_train and self.cfg.random_azimuth:
            rot = jax.random.uniform(rng, (z.shape[0], 1, 1)) * 2.0 * jnp.pi
            az = (az + rot) % (2.0 * jnp.pi)
        el_sqrt = jnp.sqrt(el + 1e-7)
        cz = jnp.sqrt(1.0 - el + 1e-7)
        cx = el_sqrt * jnp.cos(az)
        cy = el_sqrt * jnp.sin(az)
        return cx * x[:, None] + cy * y[:, None] + cz * z[:, None]

    def sample_specular_directions(self, reflections, roughness_sq, rng, is_train: bool):
        """GGX half-vector importance set about the reflection dir
        (dreammat_material.py:575-596). NOTE: like the reference, the set is
        centered on R (Karis approximation), not built from true half vectors."""
        z = reflections
        x = uops.get_orthogonal_directions(reflections)
        y = jnp.cross(z, x)
        a = roughness_sq[:, :, None] if roughness_sq.ndim == 2 else roughness_sq
        az, el = self.specular_dir_samples[:, 0], self.specular_dir_samples[:, 1]
        phi = (2.0 * jnp.pi) * az[None, :, None]
        el = el[None, :, None]
        cos_theta = jnp.sqrt((1.0 - el + 1e-6) / (1.0 + (a**2 - 1.0) * el + 1e-6) + 1e-6)
        sin_theta = jnp.sqrt(1.0 - cos_theta**2 + 1e-6)
        if is_train and self.cfg.random_azimuth:
            rot = jax.random.uniform(rng, (z.shape[0], 1, 1)) * 2.0 * jnp.pi
            phi = (phi + rot) % (2.0 * jnp.pi)
        cx = jnp.cos(phi) * sin_theta
        cy = jnp.sin(phi) * sin_theta
        return cx * x[:, None] + cy * y[:, None] + cos_theta * z[:, None]

    # ------------------------------------------------------------------
    # lights
    # ------------------------------------------------------------------
    def get_environment_light(self, directions, env_id):
        """Equirect radiance lookup; env_id is a traced scalar index.
        mode="clip": out-of-range ids (e.g. the reference's fixed eval env 4
        with fewer configured envs) must clamp, not produce NaN fill."""
        env = jnp.take(self.envs, env_id, axis=0, mode="clip")  # [H,W,3]
        return envmap_lib.sample_equirect_nearest(env, directions)

    def get_lights(self, points, directions, env_id, valid_mask=None, vis_data=None):
        """Incoming radiance with hard-shadow visibility
        (dreammat_material.py:490-507). ``vis_data=(tri_verts, bary)``
        enables the baked-visibility fast path."""
        shape = points.shape[:-1]
        env = self.get_environment_light(directions, env_id)
        from dreammat_tpu.ops.visibility import (
            PixelVisibility, lookup_visibility, lookup_visibility_pixel,
        )

        if isinstance(vis_data, PixelVisibility):
            # per-pixel baked table (fixed-camera rig): no barycentric
            # spatial error, only directional binning (ops/visibility.py)
            vis = lookup_visibility_pixel(vis_data, directions)
            lights = env * vis[..., None]
        elif self.baked_visibility is not None and vis_data is not None:
            tri_verts, bary = vis_data
            vis = lookup_visibility(self.baked_visibility, tri_verts, bary, directions)
            lights = env * vis[..., None]
        elif self.ray_trace_fun is not None:
            eps = 1e-5
            o = points.reshape(-1, 3) + directions.reshape(-1, 3) * eps
            d = directions.reshape(-1, 3)
            hit_mask = occlusion_nograd(self.ray_trace_fun, o, d)
            occluded = hit_mask.reshape(shape)
            lights = jnp.where(occluded[..., None], 0.0, env)
        else:
            lights = env
        if valid_mask is not None:
            lights = jnp.where(valid_mask[..., None], lights, 0.0)
        return lights

    # ------------------------------------------------------------------
    # shading
    # ------------------------------------------------------------------
    def features_to_material(self, features):
        act = uops.get_activation(self.cfg.material_activation)
        material = act(features)
        albedo = jnp.clip(material[..., :3], 0.0, 1.0)
        metallic = (
            material[..., 3:4] * (self.cfg.max_metallic - self.cfg.min_metallic)
            + self.cfg.min_metallic
        )
        roughness_sq = (
            material[..., 4:5]
            * (self.cfg.max_roughness_squre - self.cfg.min_roughness_squre)
            + self.cfg.min_roughness_squre
        )
        return material, albedo, metallic, roughness_sq

    def shade_raytracing(
        self, pts, normals, view_dirs, env_id, metallic, roughness_sq, albedo,
        rng, is_train: bool, mask=None, vis_data=None,
    ) -> Dict[str, jnp.ndarray]:
        """MC Cook–Torrance estimator (dreammat_material.py:615-677).
        All inputs are [P,...] fixed-size batches; ``mask`` marks real pixels
        (padding lanes shade garbage but are ignored downstream)."""
        if self.cfg.shading_chunk > 0:
            return self.shade_raytracing_streamed(
                pts, normals, view_dirs, env_id, metallic, roughness_sq, albedo,
                rng, is_train, mask=mask, vis_data=vis_data,
            )
        cfg = self.cfg
        k1, k2 = jax.random.split(rng)
        reflections = uops.reflect(view_dirs, normals)
        F0 = 0.04 * (1.0 - metallic) + metallic * albedo  # [P,3]

        diffuse_dirs = self.sample_diffuse_directions(normals, k1, is_train)  # [P,dn,3]
        dn = diffuse_dirs.shape[1]
        specular_dirs = self.sample_specular_directions(reflections, roughness_sq, k2, is_train)
        sn = specular_dirs.shape[1]

        NoL_d = uops.saturate_dot(diffuse_dirs, normals[:, None])
        p_diffuse = NoL_d / jnp.pi * (dn / (dn + sn))

        H_s = uops.safe_normalize(view_dirs[:, None] + specular_dirs)
        NoH_s = uops.saturate_dot(normals[:, None], H_s)
        VoH_s = uops.saturate_dot(view_dirs[:, None], H_s)
        p_specular = (
            distribution_ggx(NoH_s, roughness_sq[:, None])
            * NoH_s
            / (4.0 * VoH_s + 1e-5)
            * (sn / (dn + sn))
        )

        directions = jnp.concatenate([diffuse_dirs, specular_dirs], axis=1)  # [P,S,3]
        probability = jnp.concatenate([p_diffuse, p_specular], axis=1)

        H = uops.safe_normalize(view_dirs[:, None] + directions)
        HoV = uops.saturate_dot(H, view_dirs[:, None])
        fresnel = fresnel_schlick(F0[:, None], HoV)
        NoV = uops.saturate_dot(normals, view_dirs)[:, None]
        NoL = uops.saturate_dot(normals[:, None], directions)
        if cfg.geometry_type == "schlick":
            geom = geometry_schlick(NoV, NoL, roughness_sq[:, None])
        elif cfg.geometry_type == "ggx_smith":
            geom = geometry_ggx_smith_correlated(NoV, NoL, roughness_sq[:, None])
        else:
            raise NotImplementedError(cfg.geometry_type)
        NoH = uops.saturate_dot(normals[:, None], H)
        dist = distribution_ggx(NoH, roughness_sq[:, None])

        pts_rep = jnp.broadcast_to(pts[:, None], directions.shape)
        valid = None if mask is None else jnp.broadcast_to(mask[:, None], directions.shape[:-1])
        lights = self.get_lights(pts_rep, directions, env_id, valid, vis_data)  # [P,S,3]

        spec_w = dist * geom / (4.0 * NoV * probability + 1e-5)
        specular_colors = jnp.nan_to_num(jnp.mean(fresnel * lights * spec_w, axis=1))
        diffuse_colors = jnp.mean(albedo[:, None] * lights[:, :dn], axis=1)
        colors = uops.lin2srgb(diffuse_colors + specular_colors)

        sg = jax.lax.stop_gradient
        return {
            "color": colors,
            "albedo": uops.lin2srgb(sg(albedo)),
            "roughness": jnp.sqrt(roughness_sq + 1e-7),
            "metalness": metallic,
            "specular_light": uops.lin2srgb(jnp.mean(sg(lights[:, dn:]), axis=1)),
            "diffuse_light": uops.lin2srgb(jnp.mean(sg(lights[:, :dn]), axis=1)),
            "specular_color": uops.lin2srgb(sg(specular_colors)),
            "diffuse_color": uops.lin2srgb(sg(diffuse_colors)),
        }

    def shade_raytracing_streamed(
        self, pts, normals, view_dirs, env_id, metallic, roughness_sq, albedo,
        rng, is_train: bool, mask=None, vis_data=None,
    ) -> Dict[str, jnp.ndarray]:
        """Chunk-streamed version of :meth:`shade_raytracing` — numerically
        the same estimator, but the direction axis is consumed by a
        ``lax.scan`` with a rematerialized body, so peak memory is
        [P, chunk, 3] instead of [P, dn+sn, 3] (flash-attention-style
        streaming for the shading integral). Visibility per chunk comes
        from the baked table, the BVH raytracer, or neither — same
        precedence as :meth:`get_lights`."""
        cfg = self.cfg
        C = cfg.shading_chunk
        P = pts.shape[0]
        dn = self.diffuse_dir_samples.shape[0]
        sn = self.specular_dir_samples.shape[0]
        k1, k2 = jax.random.split(rng)
        reflections = uops.reflect(view_dirs, normals)
        F0 = 0.04 * (1.0 - metallic) + metallic * albedo
        NoV = uops.saturate_dot(normals, view_dirs)  # [P,1]

        # per-pixel frames + one rotation draw per set (matches unchunked)
        xd = uops.get_orthogonal_directions(normals)
        yd = jnp.cross(normals, xd)
        xs = uops.get_orthogonal_directions(reflections)
        ys = jnp.cross(reflections, xs)
        if is_train and cfg.random_azimuth:
            rot_d = jax.random.uniform(k1, (P, 1)) * 2.0 * jnp.pi
            rot_s = jax.random.uniform(k2, (P, 1)) * 2.0 * jnp.pi
        else:
            rot_d = rot_s = jnp.zeros((P, 1))

        geom_fn = (
            geometry_schlick if cfg.geometry_type == "schlick"
            else geometry_ggx_smith_correlated
        )

        def spec_contrib(dirs, prob, lights):
            """fresnel * lights * D*G/(4 NoV p); summed over the chunk."""
            Hv = uops.safe_normalize(view_dirs[:, None] + dirs)
            HoV = uops.saturate_dot(Hv, view_dirs[:, None])
            fres = fresnel_schlick(F0[:, None], HoV)
            NoL = uops.saturate_dot(normals[:, None], dirs)
            geom = geom_fn(NoV[:, None], NoL, roughness_sq[:, None])
            NoH = uops.saturate_dot(normals[:, None], Hv)
            dist = distribution_ggx(NoH, roughness_sq[:, None])
            w = dist * geom / (4.0 * NoV[:, None] * prob + 1e-5)
            return jnp.sum(fres * lights * w, axis=1)

        def chunk_lights(dirs):
            env = self.get_environment_light(dirs, env_id)
            from dreammat_tpu.ops.visibility import (
                PixelVisibility, lookup_visibility, lookup_visibility_pixel,
            )

            if isinstance(vis_data, PixelVisibility):
                vis = lookup_visibility_pixel(vis_data, dirs)
                lights = env * vis[..., None]
            elif self.baked_visibility is not None and vis_data is not None:
                tri_verts, bary = vis_data
                vis = lookup_visibility(self.baked_visibility, tri_verts, bary, dirs)
                lights = env * vis[..., None]
            elif self.ray_trace_fun is not None:
                # vjp black box (see occlusion_nograd) — the env gather
                # keeps its dirs gradient (the importance-sampling
                # reparameterization term), only the hit test is opaque
                o = (pts[:, None] + dirs * 1e-5).reshape(-1, 3)
                hit_mask = occlusion_nograd(
                    self.ray_trace_fun, o, dirs.reshape(-1, 3))
                occluded = hit_mask.reshape(dirs.shape[:-1])
                lights = jnp.where(occluded[..., None], 0.0, env)
            else:
                lights = env
            if mask is not None:
                lights = jnp.where(mask[:, None, None], lights, 0.0)
            return lights

        def pad_chunks(samples, C):
            """[N,2] -> ([n_chunks, C, 2], [n_chunks, C] validity)."""
            N = samples.shape[0]
            C = min(C, N)
            padn = (-N) % C
            ok = jnp.concatenate([jnp.ones(N), jnp.zeros(padn)]).reshape(-1, C)
            # pad with interior sample values (0.5, 0.5): el=0 pads would make
            # cos_theta marginally > 1 and sin_theta = sqrt(negative) = NaN,
            # which poisons the masked-out lanes' fresnel terms
            s = jnp.concatenate([samples, jnp.full((padn, 2), 0.5)]).reshape(-1, C, 2)
            return s, ok

        @jax.checkpoint
        def diffuse_body(carry, xs_in):
            samp, ok = xs_in  # [C,2], [C]
            az = samp[:, 0][None, :, None] * (2.0 * jnp.pi)
            el = samp[:, 1][None, :, None]
            az = (az + rot_d[:, :, None]) % (2.0 * jnp.pi)
            el_sqrt = jnp.sqrt(el + 1e-7)
            cz = jnp.sqrt(1.0 - el + 1e-7)
            dirs = (
                el_sqrt * jnp.cos(az) * xd[:, None]
                + el_sqrt * jnp.sin(az) * yd[:, None]
                + cz * normals[:, None]
            )
            NoL = uops.saturate_dot(dirs, normals[:, None])
            prob = NoL / jnp.pi * (dn / (dn + sn))
            lights = chunk_lights(dirs) * ok[None, :, None]
            spec_sum, dl_sum, sl_sum = carry
            return (
                spec_sum + spec_contrib(dirs, prob, lights),
                dl_sum + jnp.sum(lights, axis=1),
                sl_sum,
            ), None

        @jax.checkpoint
        def specular_body(carry, xs_in):
            samp, ok = xs_in
            az = samp[:, 0][None, :, None]
            el = samp[:, 1][None, :, None]
            phi = (2.0 * jnp.pi) * az
            phi = (phi + rot_s[:, :, None]) % (2.0 * jnp.pi)
            a = roughness_sq[:, None]
            cos_t = jnp.sqrt(
                jnp.clip((1.0 - el + 1e-6) / (1.0 + (a**2 - 1.0) * el + 1e-6) + 1e-6, 0.0, 1.0)
            )
            sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t**2, 0.0, 1.0) + 1e-6)
            dirs = (
                jnp.cos(phi) * sin_t * xs[:, None]
                + jnp.sin(phi) * sin_t * ys[:, None]
                + cos_t * reflections[:, None]
            )
            Hv = uops.safe_normalize(view_dirs[:, None] + dirs)
            NoH = uops.saturate_dot(normals[:, None], Hv)
            VoH = uops.saturate_dot(view_dirs[:, None], Hv)
            prob = (
                distribution_ggx(NoH, roughness_sq[:, None]) * NoH
                / (4.0 * VoH + 1e-5) * (sn / (dn + sn))
            )
            lights = chunk_lights(dirs) * ok[None, :, None]
            spec_sum, dl_sum, sl_sum = carry
            return (
                spec_sum + spec_contrib(dirs, prob, lights),
                dl_sum,
                sl_sum + jnp.sum(lights, axis=1),
            ), None

        zeros = jnp.zeros((P, 3))
        carry = (zeros, zeros, zeros)
        d_chunks, d_ok = pad_chunks(self.diffuse_dir_samples, C)
        carry, _ = jax.lax.scan(diffuse_body, carry, (d_chunks, d_ok))
        s_chunks, s_ok = pad_chunks(self.specular_dir_samples, C)
        carry, _ = jax.lax.scan(specular_body, carry, (s_chunks, s_ok))
        spec_sum, dl_sum, sl_sum = carry

        specular_colors = jnp.nan_to_num(spec_sum / (dn + sn))
        diffuse_colors = albedo * (dl_sum / dn)
        colors = uops.lin2srgb(diffuse_colors + specular_colors)
        sg = jax.lax.stop_gradient
        return {
            "color": colors,
            "albedo": uops.lin2srgb(sg(albedo)),
            "roughness": jnp.sqrt(roughness_sq + 1e-7),
            "metalness": metallic,
            "specular_light": uops.lin2srgb(sg(sl_sum / sn)),
            "diffuse_light": uops.lin2srgb(sg(dl_sum / dn)),
            "specular_color": uops.lin2srgb(sg(specular_colors)),
            "diffuse_color": uops.lin2srgb(sg(diffuse_colors)),
        }

    def shade_prefiltered(
        self, normals, view_dirs, metallic, roughness_sq, albedo, light_table,
        vis_data=None,
    ) -> Dict[str, jnp.ndarray]:
        """Per-VERTEX visibility-aware split-sum shading.

        ``light_table`` [V, 1+K, 3] from data/prerender.py: slot 0 = diffuse
        irradiance E_d at each vertex (the reference's diffuse estimator
        precomputed); slots 1..K = GGX-prefiltered radiance at TABLE_ALPHAS
        for this view's per-vertex reflection directions. With
        ``vis_data=(tri, bary)`` the per-pixel table row is the barycentric
        mix of its triangle's vertex rows (exactly what the prerender itself
        would store per pixel — vertex storage is 20-50x smaller). Then

            color = albedo * E_d + (F0 * fgA + fgB) * S(roughness)

        — the Karis split-sum factorization of the reference's specular
        estimator (weights w = G*VoH/(NoV*NoH) match the FG LUT's Gvis), with
        per-pixel shadowed light instead of a global environment.

        A per-PIXEL table [P, 1+K, 3] is also accepted (vis_data=None)."""
        from dreammat_tpu.data.prerender import TABLE_ALPHAS

        if self.fg_lut is None:
            raise RuntimeError(
                "shade_prefiltered needs cfg.use_prefiltered=true so the FG "
                "LUT is built at configure time (not inside a trace)"
            )
        levels = jnp.asarray(TABLE_ALPHAS, dtype=jnp.float32)
        K = levels.shape[0]
        if vis_data is not None:
            tri, bary = vis_data
            flat = light_table.reshape(light_table.shape[0], -1).astype(jnp.float32)
            rows = (
                bary[:, 0:1] * flat[tri[:, 0]]
                + bary[:, 1:2] * flat[tri[:, 1]]
                + bary[:, 2:3] * flat[tri[:, 2]]
            )
            light_table = rows.reshape(tri.shape[0], 1 + K, 3)
        E_d = light_table[:, 0].astype(jnp.float32)
        S = light_table[:, 1:].astype(jnp.float32)  # [P,K,3]

        r = jnp.clip(roughness_sq[:, 0], levels[0], levels[-1])
        idx = jnp.clip(jnp.searchsorted(levels, r, side="right") - 1, 0, K - 2)
        lo = levels[idx]
        hi = levels[idx + 1]
        w = ((r - lo) / (hi - lo + 1e-9))[:, None]
        S_lo = jnp.take_along_axis(S, idx[:, None, None].repeat(3, -1), axis=1)[:, 0]
        S_hi = jnp.take_along_axis(S, (idx + 1)[:, None, None].repeat(3, -1), axis=1)[:, 0]
        S_r = S_lo * (1 - w) + S_hi * w

        NoV = uops.saturate_dot(normals, view_dirs)
        fg = envmap_lib.sample_fg_lut(
            self.fg_lut, jnp.clip(NoV, 0.0, 1.0),
            jnp.sqrt(jnp.clip(roughness_sq, 0.0, 1.0)),
        )
        F0 = 0.04 * (1.0 - metallic) + metallic * albedo
        specular_colors = (F0 * fg[..., 0:1] + fg[..., 1:2]) * S_r
        diffuse_colors = albedo * E_d
        colors = uops.lin2srgb(diffuse_colors + specular_colors)
        sg = jax.lax.stop_gradient
        return {
            "color": colors,
            "albedo": uops.lin2srgb(sg(albedo)),
            "roughness": jnp.sqrt(roughness_sq + 1e-7),
            "metalness": metallic,
            "specular_light": uops.lin2srgb(sg(S_r)),
            "diffuse_light": uops.lin2srgb(sg(E_d)),
            "specular_color": uops.lin2srgb(sg(specular_colors)),
            "diffuse_color": uops.lin2srgb(sg(diffuse_colors)),
        }

    def shade_splitsum(self, normals, view_dirs, env_id, metallic, roughness, albedo):
        """Prefiltered-environment fast path (dreammat_material.py:679-711).
        Here ``roughness`` is linear (range min_roughness..max_roughness)."""
        self.ensure_splitsum()
        n_dot_v = uops.dot(normals, view_dirs)
        reflective = n_dot_v * normals * 2.0 - view_dirs
        fg = envmap_lib.sample_fg_lut(
            self.fg_lut, jnp.clip(n_dot_v, 0.0, 1.0), jnp.clip(roughness, 0.0, 1.0)
        )
        F0 = (1.0 - metallic) * 0.04 + metallic * albedo
        specular_albedo = F0 * fg[..., 0:1] + fg[..., 1:2]

        ss = jax.tree_util.tree_map(
            lambda x: jnp.take(x, env_id, axis=0, mode="clip"), self.splitsum
        )
        diffuse_light = envmap_lib.sample_splitsum_diffuse(ss, normals)
        specular_light = envmap_lib.sample_splitsum_specular(ss, reflective, roughness**2)

        color = jnp.clip(albedo * diffuse_light + specular_albedo * specular_light, 0.0, 1.0)
        sg = jax.lax.stop_gradient
        return {
            "color": color,
            "albedo": albedo,
            "roughness": roughness,
            "metalness": metallic,
            "specular_light": uops.lin2srgb(sg(specular_light)),
            "diffuse_light": uops.lin2srgb(sg(diffuse_light)),
            "specular_color": uops.lin2srgb(sg(specular_albedo)),
            "diffuse_color": uops.lin2srgb(sg(albedo)),
        }

    def __call__(
        self,
        pts: jnp.ndarray,
        features: jnp.ndarray,
        features_jitter: jnp.ndarray,
        viewdirs: jnp.ndarray,
        normals: jnp.ndarray,
        env_id,
        rng: jax.Array,
        is_train: bool = True,
        mask: Optional[jnp.ndarray] = None,
        vis_data=None,
        light_table: Optional[jnp.ndarray] = None,
    ):
        """Shade a fixed-size pixel batch; returns (outputs, mat_reg_loss)
        (forward, dreammat_material.py:713-763)."""
        material, albedo, metallic, roughness_sq = self.features_to_material(features)
        material_j, *_ = self.features_to_material(features_jitter)
        mat_reg = material_smoothness_grad(material, material_j)
        if self.cfg.use_raytracing:
            if self.cfg.use_prefiltered and light_table is not None:
                out = self.shade_prefiltered(
                    normals, viewdirs, metallic, roughness_sq, albedo, light_table,
                    vis_data=vis_data,
                )
            else:
                out = self.shade_raytracing(
                    pts, normals, viewdirs, env_id, metallic, roughness_sq, albedo,
                    rng, is_train, mask=mask, vis_data=vis_data,
                )
        else:
            act = uops.get_activation(self.cfg.material_activation)(features)
            roughness = (
                act[..., 4:5] * (self.cfg.max_roughness - self.cfg.min_roughness)
                + self.cfg.min_roughness
            )
            out = self.shade_splitsum(normals, viewdirs, env_id, metallic, roughness, albedo)
        return out, mat_reg

    def export(self, features: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Texel-space export maps (dreammat_material.py:765-797)."""
        material, albedo, metallic, roughness_sq = self.features_to_material(features)
        out = {
            "albedo": albedo,
            "metallic": metallic,
            "roughness": jnp.sqrt(roughness_sq + 1e-7),
        }
        if self.cfg.use_bump and material.shape[-1] >= 8:
            # tangent-space normal perturbation (dreammat_material.py:785-795)
            perturb = (material[..., 5:8] * 2.0 - 1.0) + jnp.asarray([0.0, 0.0, 1.0])
            perturb = uops.safe_normalize(jnp.clip(perturb, -1.0, 1.0))
            out["bump"] = (perturb + 1.0) / 2.0
        return out
