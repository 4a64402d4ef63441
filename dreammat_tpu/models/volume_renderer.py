"""NeRF volume renderer: dense fixed-shape sampling + alpha compositing.

TPU-native rebuild of ``NeRFVolumeRenderer``
(/root/reference/threestudio_dreammat/threestudio/models/renderers/
nerf_volume_renderer.py:21-462). The reference leans on nerfacc's CUDA
occupancy-grid estimator, which emits a *ragged* (ray_indices, t_starts,
t_ends) compaction — the exact pattern XLA cannot tile. The TPU-first
redesign keeps every stage dense and fixed-shape:

- rays are intersected with the scene AABB analytically (slab test) to get
  per-ray [t_near, t_far] — no global far plane marching;
- the "occgrid" estimator becomes (a) a fixed-length coarse march through a
  binary occupancy grid that *tightens* each ray's [t_near, t_far] to the
  occupied span, and (b) density masking at empty cells. The grid itself is
  EMA-updated from jittered per-cell density probes exactly like nerfacc's
  ``update_every_n_steps`` (reference :422-436), but as a pure
  ``update_occ(state) -> state`` jitted function;
- the "importance" estimator is the classic coarse-to-fine inverse-CDF
  resample (reference ImportanceEstimator, models/estimators.py) — a dense
  [rays, samples] searchsorted, which XLA vectorizes cleanly;
- compositing weights come from an exclusive cumulative sum of sigma*delta
  (w_i = T_i * (1 - exp(-sigma_i delta_i))) — ``nerfacc.render_weight_from
  _density`` (:313-319) without the scatter/segment machinery: on dense
  [N, S] grids it is two elementwise ops and a cumsum along S.

Everything (both estimators + shading + compositing) traces into the one
jitted train step; rays per call are fixed by the caller so there is a
single compile per resolution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.utils.ops import safe_normalize
from dreammat_tpu.utils.base import BaseObject


def ray_aabb(rays_o, rays_d, lo, hi):
    """Slab test: per-ray [t0, t1] against the axis-aligned box; t1 <= t0
    where the ray misses."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    ta = (lo - rays_o) * inv
    tb = (hi - rays_o) * inv
    tmin = jnp.minimum(ta, tb).max(axis=-1)
    tmax = jnp.maximum(ta, tb).min(axis=-1)
    return jnp.maximum(tmin, 0.0), jnp.maximum(tmax, 0.0)


@dreammat_tpu.register("nerf-volume-renderer")
class NeRFVolumeRenderer(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        num_samples_per_ray: int = 512
        # in ["occgrid", "importance"]; "proposal" maps to "importance"
        # (both are density-driven resampling; the reference's proposal net
        # is a CUDA-era optimization of the same estimate)
        estimator: str = "occgrid"
        # occgrid
        grid_resolution: int = 32
        grid_prune: bool = True
        prune_alpha_threshold: bool = True
        grid_update_every: int = 16
        grid_ema_decay: float = 0.95
        occ_threshold: float = 0.01
        # importance
        num_samples_per_ray_importance: int = 64
        randomized: bool = True
        near_plane: float = 0.0
        far_plane: float = 1.0e10
        return_comp_normal: bool = False
        return_normal_perturb: bool = False
        eval_chunk_rays: int = 8192

    cfg: Config
    is_volume: bool = True

    def __init__(self, cfg, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        super().__init__(cfg)

    def configure(self) -> None:
        r = self.cfg.radius
        self.bbox_lo = jnp.asarray([-r, -r, -r], jnp.float32)
        self.bbox_hi = jnp.asarray([r, r, r], jnp.float32)
        # matches nerfacc's render_step_size choice (reference :66-68)
        self.render_step_size = 1.732 * 2 * r / self.cfg.num_samples_per_ray
        self.mesh = None  # volume systems carry no mesh

    # -- occupancy state ----------------------------------------------------
    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        """All-empty grid (nerfacc inits occs to zero); callers must run
        ``update_occ`` once before the first render — the systems do this in
        ``init_state`` so step 0 already sees the density blob."""
        G = self.cfg.grid_resolution
        return {"occ": jnp.zeros((G, G, G), jnp.float32)}

    def update_occ(self, geo_params, state: Dict[str, Any], rng: jax.Array) -> Dict[str, Any]:
        """EMA occupancy refresh from one jittered density probe per cell
        (nerfacc OccGridEstimator.update_every_n_steps semantics,
        reference :425-436: occ ~ density * render_step_size)."""
        G = self.cfg.grid_resolution
        lo, hi = self.bbox_lo, self.bbox_hi
        cell = (hi - lo) / G
        idx = jnp.stack(
            jnp.meshgrid(*[jnp.arange(G)] * 3, indexing="ij"), axis=-1
        ).reshape(-1, 3)
        jitter = jax.random.uniform(rng, idx.shape)
        pts = lo + (idx + jitter) * cell
        d = self._occ_density(geo_params, pts)
        occ_new = (d * self.render_step_size).reshape(G, G, G)
        occ = jnp.maximum(state["occ"] * self.cfg.grid_ema_decay, occ_new)
        return {**state, "occ": occ}

    def _occ_binary(self, state) -> jnp.ndarray:
        if not self.cfg.grid_prune:
            return jnp.ones_like(state["occ"], dtype=bool)
        return state["occ"] > self.cfg.occ_threshold

    def _occ_at(self, occ_bin, pts) -> jnp.ndarray:
        G = self.cfg.grid_resolution
        u = (pts - self.bbox_lo) / (self.bbox_hi - self.bbox_lo)
        ij = jnp.clip((u * G).astype(jnp.int32), 0, G - 1)
        return occ_bin[ij[..., 0], ij[..., 1], ij[..., 2]]

    # -- sampling -----------------------------------------------------------
    def _tighten_by_grid(self, occ_bin, rays_o, rays_d, t0, t1):
        """Shrink [t0, t1] to the span of occupied cells along the ray via a
        fixed-length coarse march (2*G probes — the TPU replacement for
        nerfacc's ragged skip lists)."""
        M = 2 * self.cfg.grid_resolution
        frac = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M
        t = t0[:, None] + frac[None, :] * (t1 - t0)[:, None]  # [N,M]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        occ = self._occ_at(occ_bin, pts)  # [N,M] bool
        big = jnp.float32(1e9)
        t_first = jnp.min(jnp.where(occ, t, big), axis=1)
        t_last = jnp.max(jnp.where(occ, t, -big), axis=1)
        any_occ = jnp.any(occ, axis=1)
        pad = (t1 - t0) / M
        nt0 = jnp.where(any_occ, jnp.maximum(t_first - pad, t0), t0)
        nt1 = jnp.where(any_occ, jnp.minimum(t_last + pad, t1), t0)  # empty ray -> zero span
        return nt0, nt1

    def _stratified(self, rng, t0, t1, S, randomized):
        N = t0.shape[0]
        frac = (jnp.arange(S, dtype=jnp.float32)) / S
        if randomized:
            u = jax.random.uniform(rng, (N, S)) / S
        else:
            u = jnp.full((N, S), 0.5 / S)
        return t0[:, None] + (frac[None, :] + u) * (t1 - t0)[:, None]  # [N,S]

    def _importance_resample(self, rng, t_coarse, w_coarse, t0, t1, S):
        """Inverse-CDF draw of S sorted samples from the coarse weight
        histogram (ImportanceEstimator semantics, dense searchsorted)."""
        N, Sc = w_coarse.shape
        w = w_coarse + 1e-5
        cdf = jnp.cumsum(w, axis=1)
        cdf = cdf / cdf[:, -1:]
        cdf = jnp.concatenate([jnp.zeros((N, 1)), cdf], axis=1)  # [N,Sc+1]
        # bin edges: extend coarse midpoints to interval bounds
        edges = jnp.concatenate(
            [t0[:, None], 0.5 * (t_coarse[:, 1:] + t_coarse[:, :-1]), t1[:, None]],
            axis=1,
        )  # [N,Sc+1]
        u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        u = u[None, :] + jax.random.uniform(rng, (N, S)) / S - 0.5 / S
        u = jnp.clip(u, 0.0, 1.0 - 1e-6)
        k = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
        k = jnp.clip(k, 1, Sc)  # bin index in [1, Sc]
        c0 = jnp.take_along_axis(cdf, k - 1, axis=1)
        c1 = jnp.take_along_axis(cdf, k, axis=1)
        e0 = jnp.take_along_axis(edges, k - 1, axis=1)
        e1 = jnp.take_along_axis(edges, k, axis=1)
        frac = (u - c0) / jnp.maximum(c1 - c0, 1e-8)
        return e0 + frac * (e1 - e0)  # sorted because u is stratified

    @staticmethod
    def _weights(sigma, delta):
        """w_i = T_i * (1 - exp(-sigma_i delta_i)), T exclusive cumprod —
        dense equivalent of nerfacc.render_weight_from_density."""
        sd = sigma * delta
        alpha = 1.0 - jnp.exp(-sd)
        T = jnp.exp(-jnp.concatenate(
            [jnp.zeros_like(sd[:, :1]), jnp.cumsum(sd[:, :-1], axis=1)], axis=1
        ))
        return T * alpha

    # -- render -------------------------------------------------------------
    def render_rays(
        self,
        geo_params,
        bg_params,
        state: Dict[str, Any],
        rays_o: jnp.ndarray,          # [N,3]
        rays_d: jnp.ndarray,          # [N,3]
        light_positions: jnp.ndarray, # [N,3]
        rng: jax.Array,
        step=0,
        is_train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        N = rays_o.shape[0]
        S = cfg.num_samples_per_ray
        randomized = bool(cfg.randomized and is_train)
        k_strat, k_coarse, k_imp, k_mat, k_perturb = jax.random.split(rng, 5)

        t0, t1 = ray_aabb(rays_o, rays_d, self.bbox_lo, self.bbox_hi)
        t0 = jnp.maximum(t0, cfg.near_plane)
        t1 = jnp.clip(t1, t0, cfg.far_plane)

        occ_bin = None
        if cfg.estimator == "occgrid":
            occ_bin = self._occ_binary(state)
            if cfg.grid_prune:
                t0, t1 = self._tighten_by_grid(occ_bin, rays_o, rays_d, t0, t1)
            t = self._stratified(k_strat, t0, t1, S, randomized)
        elif cfg.estimator in ("importance", "proposal"):
            Sc = cfg.num_samples_per_ray_importance
            tc = self._stratified(k_coarse, t0, t1, Sc, randomized)
            pc = rays_o[:, None, :] + rays_d[:, None, :] * tc[..., None]
            sigma_c = jax.lax.stop_gradient(
                self.geometry.forward_density(geo_params, pc)[..., 0]
            )
            delta_c = jnp.broadcast_to(((t1 - t0) / Sc)[:, None], tc.shape)
            wc = self._weights(sigma_c, delta_c)
            t = self._importance_resample(k_imp, tc, wc, t0, t1, S)
        else:
            raise ValueError(f"unknown estimator {cfg.estimator}")

        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]  # [N,S,3]
        geo_out = self.geometry.apply(
            geo_params, pts, output_normal=getattr(self.material, "requires_normal", False)
        )
        sigma = geo_out["density"][..., 0]  # [N,S]
        if occ_bin is not None and cfg.prune_alpha_threshold:
            sigma = sigma * self._occ_at(occ_bin, pts)
        valid = (t1 > t0)[:, None]
        sigma = sigma * valid

        # per-sample interval: midpoint spacing, endpoint-padded
        dt = jnp.diff(t, axis=1)
        delta = jnp.concatenate([dt, dt[:, -1:]], axis=1)
        delta = jnp.maximum(delta, 1e-6)
        w = self._weights(sigma, delta)  # [N,S]

        rgb_s = self.material(
            geo_out.get("features"),
            positions=pts,
            shading_normal=geo_out.get("shading_normal"),
            light_positions=light_positions[:, None, :],
            viewdirs=jnp.broadcast_to(rays_d[:, None, :], pts.shape),
            rng=k_mat,
            step=step,
            is_train=is_train,
        )  # [N,S,3]

        opacity = jnp.sum(w, axis=1, keepdims=True)  # [N,1]
        depth = jnp.sum(w * t, axis=1, keepdims=True)
        comp_rgb_fg = jnp.sum(w[..., None] * rgb_s, axis=1)  # [N,3]
        z_var = jnp.sum(w * (t - depth) ** 2, axis=1, keepdims=True)
        comp_rgb_bg = self.background(rays_d, bg_params)
        comp_rgb = comp_rgb_fg + comp_rgb_bg * (1.0 - opacity)

        out = {
            "comp_rgb": comp_rgb,
            "comp_rgb_fg": comp_rgb_fg,
            "comp_rgb_bg": comp_rgb_bg,
            "opacity": opacity,
            "depth": depth,
            "z_variance": z_var,
            "weights": w,
            "t_points": t,
            "t_dirs": jnp.broadcast_to(rays_d[:, None, :], pts.shape),
            "points": pts,
            # raw per-sample sigma [N,S] — latentnerf's ShapeLoss consumes
            # (points, density) pairs (reference latentnerf.py:94)
            "density": sigma,
        }
        if "normal" in geo_out:
            out["normal"] = geo_out["normal"]
            comp_normal = jnp.sum(w[..., None] * geo_out["normal"], axis=1)
            comp_normal = safe_normalize(comp_normal)
            out["comp_normal"] = (comp_normal + 1.0) / 2.0 * opacity
            if is_train and cfg.return_normal_perturb:
                out["normal_perturb"] = self.geometry.apply(
                    geo_params,
                    pts + jax.random.normal(k_perturb, pts.shape) * 1e-2,
                    output_normal=True,
                )["normal"]
        return out

    # hook for SDF-family subclasses: how to query scalar "density" for the
    # occupancy refresh
    def _occ_density(self, geo_params, pts):
        return self.geometry.forward_density(geo_params, pts)[..., 0]

    def render_image(
        self, geo_params, bg_params, state, rays_o, rays_d, light_position,
        rng, step=0, **render_kw,
    ) -> Dict[str, jnp.ndarray]:
        """Eval helper: [H,W,3] rays -> composited [H,W,...] maps, chunked
        to bound sample memory (reference eval_chunk_size, :162-166).
        Extra kwargs (e.g. NeuS var_params) pass through to render_rays."""
        H, W = rays_o.shape[:2]
        n = H * W
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        C = min(self.cfg.eval_chunk_rays, n)
        pad = (-n) % C
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)))
        lp = jnp.broadcast_to(light_position[None], ro.shape)
        outs = []
        for i in range(0, n + pad, C):
            outs.append(self.render_rays(
                geo_params, bg_params, state, ro[i:i + C], rd[i:i + C],
                lp[i:i + C], jax.random.fold_in(rng, i), step=step,
                is_train=False, **render_kw,
            ))
        keys = ("comp_rgb", "opacity", "depth", "comp_normal")
        out = {}
        for key in keys:
            if outs and key in outs[0]:
                v = jnp.concatenate([o[key] for o in outs])[:n]
                out[key] = v.reshape(H, W, v.shape[-1])
        return out


def volsdf_density(sdf, inv_std):
    """Laplace-CDF density (reference neus_volume_renderer.py:19-23)."""
    inv_std = jnp.clip(inv_std, 0.0, 80.0)
    return inv_std * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) * inv_std))


@dreammat_tpu.register("neus-volume-renderer")
class NeuSVolumeRenderer(NeRFVolumeRenderer):
    """NeuS/VolSDF volume renderer over an implicit-sdf geometry.

    Rebuild of ``NeuSVolumeRenderer``
    (/root/reference/threestudio_dreammat/threestudio/models/renderers/
    neus_volume_renderer.py:41-356) on the same dense fixed-shape sampling
    stack as the NeRF renderer; only the alpha model differs:

    - NeuS (default): per-interval alpha from the logistic CDF of the SDF
      at estimated interval endpoints, with the cos-anneal warmup
      (:93-117); the single learned variance ``s = exp(10 * raw)`` lives in
      a tiny trainable pytree the system owns (``init_variance``), since
      everything here is pure functions over explicit params.
    - ``use_volsdf=True``: sigma = Laplace-CDF density and the standard
      exp-compositing path (:96).

    The geometry contract is ``apply() -> {sdf, features, normal,
    sdf_grad}``; ``sdf_grad`` is forwarded for the system's eikonal loss.
    """

    @dataclass
    class Config(NeRFVolumeRenderer.Config):
        learned_variance_init: float = 0.3
        cos_anneal_end_steps: int = 0
        use_volsdf: bool = False

    cfg: Config

    def init_variance(self) -> Dict[str, jnp.ndarray]:
        """Trainable pytree: raw variance (LearnedVariance, :26-37)."""
        return {"_inv_std": jnp.float32(self.cfg.learned_variance_init)}

    @staticmethod
    def inv_std(var_params) -> jnp.ndarray:
        return jnp.clip(jnp.exp(var_params["_inv_std"] * 10.0), 1e-6, 1e6)

    def _occ_density(self, geo_params, pts):
        # occupancy proxy for the pruning grid: the band |sdf| < cell
        # diagonal is "occupied" (nerfacc uses the alpha_fn; a fixed
        # moderate inv_std gives the same thresholding behavior)
        sdf = self.geometry.forward_sdf(geo_params, pts)[..., 0]
        return volsdf_density(sdf, 20.0)

    def _alphas(self, sdf, normal, dirs, delta, var_params, step):
        inv_std = self.inv_std(var_params)
        if self.cfg.use_volsdf:
            sd = volsdf_density(sdf, inv_std) * delta
            alpha = 1.0 - jnp.exp(-sd)
        else:
            true_cos = jnp.sum(normal * dirs, axis=-1)
            if self.cfg.cos_anneal_end_steps > 0:
                ratio = jnp.clip(
                    jnp.asarray(step, jnp.float32) / self.cfg.cos_anneal_end_steps,
                    0.0, 1.0,
                )
            else:
                ratio = 1.0
            # annealed |cos| estimate (:99-107): early training sees the
            # relaxed 0.5*(1-cos) so gradients reach back-facing samples
            iter_cos = -(
                jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - ratio)
                + jax.nn.relu(-true_cos) * ratio
            )
            est_next = sdf + iter_cos * delta * 0.5
            est_prev = sdf - iter_cos * delta * 0.5
            prev_cdf = jax.nn.sigmoid(est_prev * inv_std)
            next_cdf = jax.nn.sigmoid(est_next * inv_std)
            alpha = jnp.clip(
                (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0
            )
        T = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1] + 1e-7],
                            axis=1),
            axis=1,
        )
        return T * alpha

    def render_rays(
        self, geo_params, bg_params, state, rays_o, rays_d, light_positions,
        rng, step=0, is_train: bool = False, var_params=None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        if var_params is None:
            var_params = self.init_variance()
        S = cfg.num_samples_per_ray
        randomized = bool(cfg.randomized and is_train)
        k_strat, k_coarse, k_imp, k_mat = jax.random.split(rng, 4)

        t0, t1 = ray_aabb(rays_o, rays_d, self.bbox_lo, self.bbox_hi)
        t0 = jnp.maximum(t0, cfg.near_plane)
        t1 = jnp.clip(t1, t0, cfg.far_plane)

        occ_bin = None
        if cfg.estimator == "occgrid":
            occ_bin = self._occ_binary(state)
            if cfg.grid_prune:
                t0, t1 = self._tighten_by_grid(occ_bin, rays_o, rays_d, t0, t1)
            t = self._stratified(k_strat, t0, t1, S, randomized)
        elif cfg.estimator in ("importance", "proposal"):
            # VolSDF density drives the coarse pass (:197-218)
            Sc = cfg.num_samples_per_ray_importance
            tc = self._stratified(k_coarse, t0, t1, Sc, randomized)
            pc = rays_o[:, None, :] + rays_d[:, None, :] * tc[..., None]
            sdf_c = jax.lax.stop_gradient(
                self.geometry.forward_sdf(geo_params, pc)[..., 0]
            )
            sigma_c = volsdf_density(sdf_c, self.inv_std(var_params))
            delta_c = jnp.broadcast_to(((t1 - t0) / Sc)[:, None], tc.shape)
            wc = self._weights(sigma_c, delta_c)
            t = self._importance_resample(k_imp, tc, wc, t0, t1, S)
        else:
            raise ValueError(f"unknown estimator {cfg.estimator}")

        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        geo_out = self.geometry.apply(geo_params, pts, output_normal=True)
        sdf = geo_out["sdf"][..., 0]
        normal = geo_out["normal"]
        t_dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

        dt = jnp.diff(t, axis=1)
        delta = jnp.concatenate([dt, dt[:, -1:]], axis=1)
        delta = jnp.maximum(delta, 1e-6)

        w = self._alphas(sdf, normal, t_dirs, delta, var_params, step)
        if occ_bin is not None and cfg.prune_alpha_threshold:
            w = w * self._occ_at(occ_bin, pts)
        valid = (t1 > t0)[:, None]
        w = w * valid

        rgb_s = self.material(
            geo_out.get("features"),
            positions=pts,
            shading_normal=normal,
            light_positions=light_positions[:, None, :],
            viewdirs=t_dirs,
            rng=k_mat,
            step=step,
            is_train=is_train,
        )

        opacity = jnp.sum(w, axis=1, keepdims=True)
        depth = jnp.sum(w * t, axis=1, keepdims=True)
        comp_rgb_fg = jnp.sum(w[..., None] * rgb_s, axis=1)
        z_var = jnp.sum(w * (t - depth) ** 2, axis=1, keepdims=True)
        comp_rgb_bg = self.background(rays_d, bg_params)
        comp_rgb = comp_rgb_fg + comp_rgb_bg * (1.0 - opacity)

        comp_normal = jnp.sum(w[..., None] * normal, axis=1)
        comp_normal = safe_normalize(comp_normal)
        return {
            "comp_rgb": comp_rgb,
            "comp_rgb_fg": comp_rgb_fg,
            "comp_rgb_bg": comp_rgb_bg,
            "opacity": opacity,
            "depth": depth,
            "z_variance": z_var,
            "weights": w,
            "t_points": t,
            "t_dirs": t_dirs,
            "points": pts,
            "normal": normal,
            "sdf_grad": geo_out["sdf_grad"],
            "comp_normal": (comp_normal + 1.0) / 2.0 * opacity,
            "inv_std": self.inv_std(var_params),
        }


@dreammat_tpu.register("patch-renderer")
class PatchRenderer(BaseObject):
    """Memory-bounded full-resolution training: low-res global render +
    one random full-res patch pasted over it.

    Rebuild of ``PatchRenderer``
    (/root/reference/threestudio_dreammat/threestudio/models/renderers/
    patch_renderer.py:15-106) with static shapes throughout: the reference
    bilinearly downsamples the ray grid and crops with a python randint;
    here the global pass subsamples rays with a fixed stride (equivalent
    ray selection, no interpolation of ray directions needed) and the patch
    is a ``lax.dynamic_slice`` at a *traced* random offset — everything
    stays inside the one jitted train step, no per-offset recompiles.

    Image-like outputs (leading dim == n_rays) are upsampled from the
    global pass and overwritten in the patch window; sample-dim outputs
    (weights, per-sample normals, ...) come from the global pass unchanged,
    matching the reference's ``valid_patch_key`` filter.
    """

    @dataclass
    class Config:
        patch_size: int = 128
        base_renderer_type: str = "nerf-volume-renderer"
        base_renderer: Any = None
        global_detach: bool = False
        global_downsample: int = 4

    cfg: Config
    is_volume: bool = True

    def __init__(self, cfg, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        super().__init__(cfg)

    def configure(self) -> None:
        self.base = dreammat_tpu.find(self.cfg.base_renderer_type)(
            self.cfg.base_renderer or {},
            self.geometry, self.material, self.background,
        )
        self.mesh = None
        # systems poke renderer.cfg.estimator/grid_prune/grid_update_every
        # for the occupancy refresh; mirror the base's knobs onto our cfg
        for k in ("estimator", "grid_prune", "grid_update_every"):
            setattr(self.cfg, k, getattr(self.base.cfg, k, None))

    # -- delegated state ----------------------------------------------------
    def init_state(self, rng):
        return self.base.init_state(rng)

    def update_occ(self, geo_params, state, rng):
        return self.base.update_occ(geo_params, state, rng)

    def render_image(self, *a, **kw):
        return self.base.render_image(*a, **kw)

    def render_rays(
        self, geo_params, bg_params, state, rays_o, rays_d, light_positions,
        rng, step=0, is_train: bool = False, **kw,
    ):
        if not is_train:
            return self.base.render_rays(
                geo_params, bg_params, state, rays_o, rays_d, light_positions,
                rng, step=step, is_train=is_train, **kw,
            )
        N = rays_o.shape[0]
        H = W = int(round(float(N) ** 0.5))
        if H * W != N:
            raise ValueError(
                f"patch-renderer needs a square ray grid, got {N} rays"
            )
        ds = self.cfg.global_downsample
        PS = min(self.cfg.patch_size, H, W)
        k_off, k_g, k_p = jax.random.split(rng, 3)

        go = rays_o.reshape(H, W, 3)
        gd = rays_d.reshape(H, W, 3)
        gl = light_positions.reshape(H, W, 3)

        # global pass: strided ray subsample (:52-63)
        sub = lambda img: img[ds // 2 :: ds, ds // 2 :: ds].reshape(-1, 3)
        out_g = self.base.render_rays(
            geo_params, bg_params, state, sub(go), sub(gd), sub(gl),
            k_g, step=step, is_train=True, **kw,
        )
        Hg = len(range(ds // 2, H, ds))
        Wg = len(range(ds // 2, W, ds))
        Ng = Hg * Wg

        # patch pass at a traced random offset (:65-71)
        py = jax.random.randint(k_off, (), 0, H - PS + 1)
        px = jax.random.randint(jax.random.fold_in(k_off, 1), (), 0, W - PS + 1)
        sl = lambda img: jax.lax.dynamic_slice(
            img, (py, px, 0), (PS, PS, 3)
        ).reshape(-1, 3)
        out_p = self.base.render_rays(
            geo_params, bg_params, state, sl(go), sl(gd), sl(gl),
            k_p, step=step, is_train=True, **kw,
        )

        # merge: upsample image-like globals to [H, W], paste patch (:73-90).
        # The reference detects image-like keys by comparing shapes with
        # comp_rgb (:79-84); in our flat [N, C] layout that test cannot
        # tell an image from per-sample [N, S] outputs, so the set is
        # explicit.
        IMAGE_KEYS = (
            "comp_rgb", "comp_rgb_fg", "comp_rgb_bg", "opacity", "depth",
            "comp_normal", "z_variance",
        )
        out = {}
        for key, vg in out_g.items():
            vp = out_p.get(key)
            if (
                key in IMAGE_KEYS
                and vp is not None
                and hasattr(vg, "ndim") and vg.ndim == 2
                and vg.shape[0] == Ng and vp.shape[0] == PS * PS
            ):
                C = vg.shape[1]
                full = jax.image.resize(
                    vg.reshape(Hg, Wg, C), (H, W, C), method="linear"
                )
                if self.cfg.global_detach:
                    full = jax.lax.stop_gradient(full)
                full = jax.lax.dynamic_update_slice(
                    full, vp.reshape(PS, PS, C), (py, px, 0)
                )
                out[key] = full.reshape(N, C)
            else:
                out[key] = vg
        return out
