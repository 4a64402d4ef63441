"""Environment lighting: equirect lookup, split-sum prefiltering, FG LUT.

TPU-native replacement of ``envlight`` + the equirect lookups in the
reference material (/root/reference/threestudio_dreammat/threestudio/models/
materials/dreammat_material.py:383-507,679-711). All prefiltering runs in
JAX once at load; the per-step lookups are pure gathers inside jit. The
FG LUT (the 256x256 split-sum BRDF table the reference ships as
``load/lights/bsdf_256_256.bin``) is *computed* here by Monte-Carlo
integration instead of shipped as a binary asset.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.utils import ops as uops


# ---------------------------------------------------------------------------
# HDR IO (Radiance .hdr reader/writer in numpy; .exr via cv2 when present)
# ---------------------------------------------------------------------------

def read_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) reader -> float32 [H,W,3]."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a radiance HDR file")
    # header ends at blank line; then resolution line
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad hdr header")
    pos += 2
    eol = data.find(b"\n", pos)
    res = data[pos:eol].decode("ascii").split()
    assert res[0] == "-Y" and res[2] == "+X", f"unsupported orientation {res}"
    H, W = int(res[1]), int(res[3])
    pos = eol + 1
    img = np.zeros((H, W, 4), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8, offset=pos)
    bp = 0
    for y in range(H):
        if buf[bp] == 2 and buf[bp + 1] == 2 and (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) == W:
            bp += 4  # new-style RLE, per-channel
            for c in range(4):
                x = 0
                while x < W:
                    n = int(buf[bp]); bp += 1
                    if n > 128:  # run
                        img[y, x : x + n - 128, c] = buf[bp]
                        bp += 1
                        x += n - 128
                    else:  # literal
                        img[y, x : x + n, c] = buf[bp : bp + n]
                        bp += n
                        x += n
        else:  # flat scanline
            row = buf[bp : bp + W * 4].reshape(W, 4)
            img[y] = row
            bp += W * 4
    rgbe = img.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e.astype(np.int32) - 136), 0.0)
    return (rgbe[..., :3] + 0.5) * scale[..., None] * np.where(e > 0, 1.0, 0.0)[..., None]


def write_hdr(path: str, img: np.ndarray) -> None:
    """Write float32 [H,W,3] as uncompressed Radiance HDR."""
    H, W, _ = img.shape
    rgb = np.maximum(img, 0.0)
    maxc = rgb.max(axis=-1)
    e = np.zeros((H, W), dtype=np.int32)
    mant = np.zeros_like(rgb)
    nz = maxc > 1e-32
    e[nz] = np.ceil(np.log2(maxc[nz])).astype(np.int32) + 1
    scale = np.ldexp(1.0, -e) * 256.0
    mant = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe = np.concatenate([mant, (e + 128)[..., None].astype(np.uint8)], axis=-1)
    rgbe[~nz] = 0
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode("ascii"))
        f.write(rgbe.tobytes())


def load_envmap_file(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        return read_hdr(path)
    if ext == ".exr":
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise ValueError(f"cv2 failed to read {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    raise ValueError(f"unsupported envmap format {ext}")


def resize_envmap(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Area-ish resize via jax.image (host call, once at load)."""
    out = jax.image.resize(jnp.asarray(img), (height, width, 3), method="linear")
    return np.asarray(out)


def make_procedural_envmap(
    height: int = 256,
    width: int = 512,
    sun_dir=(0.5, 0.5, 0.7),
    sun_intensity: float = 20.0,
    sky_color=(0.35, 0.45, 0.65),
    ground_color=(0.25, 0.2, 0.15),
    seed: int = 0,
) -> np.ndarray:
    """Analytic sky+sun equirect map used when no HDR assets are available
    (tests / smoke runs). Directions follow :func:`equirect_uv`."""
    v, u = np.meshgrid(
        (np.arange(height) + 0.5) / height, (np.arange(width) + 0.5) / width, indexing="ij"
    )
    theta = v * np.pi          # from +z
    phi = (0.5 - u) * 2 * np.pi
    d = np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)], -1
    )
    sd = np.asarray(sun_dir, dtype=np.float64)
    sd = sd / np.linalg.norm(sd)
    cos_sun = (d * sd).sum(-1)
    sky_t = np.clip(d[..., 2] * 0.5 + 0.5, 0, 1)[..., None]
    base = sky_t * np.asarray(sky_color) + (1 - sky_t) * np.asarray(ground_color)
    sun = np.exp((cos_sun - 1.0) * 400.0)[..., None] * sun_intensity
    return (base + sun).astype(np.float32)


# ---------------------------------------------------------------------------
# equirect sampling (matches get_envirmentlight_blender,
# dreammat_material.py:439-455: z is the polar axis)
# ---------------------------------------------------------------------------

def equirect_uv(directions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = uops.safe_normalize(directions)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x) % (2.0 * jnp.pi)
    u = -phi / (2.0 * jnp.pi) + 0.5
    v = theta / jnp.pi
    return u, v


def sample_equirect_nearest(env: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor equirect lookup (reference parity). env: [H,W,3]."""
    H, W = env.shape[-3], env.shape[-2]
    u, v = equirect_uv(directions)
    xi = (u * W).astype(jnp.int32) % W
    yi = (v * H).astype(jnp.int32) % H
    return env[..., yi, xi, :] if env.ndim == 3 else env[yi, xi]


def sample_equirect_bilinear(env: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect lookup with azimuth wrap. env: [H,W,3]."""
    H, W = env.shape[-3], env.shape[-2]
    u, v = equirect_uv(directions)
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) % W
    x1i = (x0.astype(jnp.int32) + 1) % W
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    c00 = env[y0i, x0i]
    c01 = env[y0i, x1i]
    c10 = env[y1i, x0i]
    c11 = env[y1i, x1i]
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


# ---------------------------------------------------------------------------
# split-sum prefiltering (envlight replacement, runs once at load)
# ---------------------------------------------------------------------------

def _equirect_directions(H: int, W: int) -> jnp.ndarray:
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    vv, uu = jnp.meshgrid(v, u, indexing="ij")
    theta = vv * jnp.pi
    phi = (0.5 - uu) * 2.0 * jnp.pi
    return jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )


def prefilter_diffuse(env: jnp.ndarray, out_h: int = 32, out_w: int = 64, n_samples: int = 512) -> jnp.ndarray:
    """Cosine-convolved irradiance map E(n)/pi in equirect layout [h,w,3]."""
    az, el = uops.sample_sphere_fibonacci(n_samples)  # upper hemisphere
    az = jnp.asarray(az)
    el = jnp.asarray(el)
    # tangent-hemisphere dirs with cosine weight ~ uniform-hemisphere * cos
    local = jnp.stack(
        [jnp.cos(az) * jnp.cos(el), jnp.sin(az) * jnp.cos(el), jnp.sin(el)], axis=-1
    )  # [S,3] uniform hemisphere (z>=0)
    normals = _equirect_directions(out_h, out_w).reshape(-1, 3)  # [P,3]
    t = uops.get_orthogonal_directions(normals)
    b = jnp.cross(normals, t)
    dirs = (
        local[None, :, 0:1] * t[:, None]
        + local[None, :, 1:2] * b[:, None]
        + local[None, :, 2:3] * normals[:, None]
    )  # [P,S,3]
    L = sample_equirect_bilinear(env, dirs)  # [P,S,3]
    cosw = jnp.clip(local[None, :, 2:3], 0.0, 1.0)
    # E/pi = 2 * mean(L cos) for uniform-hemisphere sampling (pdf = 1/2pi)
    out = 2.0 * jnp.mean(L * cosw, axis=1)
    return out.reshape(out_h, out_w, 3)


def prefilter_specular_level(env: jnp.ndarray, roughness_sq: float, out_h: int, out_w: int, n_samples: int = 256) -> jnp.ndarray:
    """GGX-prefiltered radiance for one (squared) roughness, equirect [h,w,3]."""
    if roughness_sq < 1e-5:
        return jax.image.resize(env, (out_h, out_w, 3), method="linear")
    az, el = uops.sample_sphere_fibonacci(n_samples)
    u1 = jnp.asarray(az) / (2.0 * jnp.pi)
    # reuse the fibonacci el in [0,pi/2] -> unit variable
    u2 = jnp.asarray(1.0 - 2.0 * el / jnp.pi)
    a = roughness_sq
    cos_t = jnp.sqrt(jnp.clip((1.0 - u2) / (1.0 + (a * a - 1.0) * u2 + 1e-9), 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t**2, 0.0, 1.0))
    phi = 2.0 * jnp.pi * u1
    local_h = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)  # [S,3]
    refl = _equirect_directions(out_h, out_w).reshape(-1, 3)  # N = V = R approx
    t = uops.get_orthogonal_directions(refl)
    b = jnp.cross(refl, t)
    h = (
        local_h[None, :, 0:1] * t[:, None]
        + local_h[None, :, 1:2] * b[:, None]
        + local_h[None, :, 2:3] * refl[:, None]
    )
    # L = reflect(V=refl, h)
    l = 2.0 * jnp.sum(refl[:, None] * h, -1, keepdims=True) * h - refl[:, None]
    w = jnp.clip(jnp.sum(refl[:, None] * l, -1, keepdims=True), 0.0, 1.0)
    L = sample_equirect_bilinear(env, l)
    out = jnp.sum(L * w, axis=1) / (jnp.sum(w, axis=1) + 1e-6)
    return out.reshape(out_h, out_w, 3)


SPECULAR_LEVELS = (0.0, 0.04, 0.12, 0.25, 0.45, 0.7, 1.0)  # roughness^2 per mip


def build_splitsum(env: jnp.ndarray, base_h: int = 128, base_w: int = 256):
    """Precompute diffuse irradiance + roughness-mip specular stack.
    Returns dict of arrays (a pytree ready to be captured by jit)."""
    spec = [
        prefilter_specular_level(env, r, base_h, base_w) for r in SPECULAR_LEVELS
    ]
    return {
        "diffuse": prefilter_diffuse(env),
        "specular": jnp.stack(spec),  # [M, h, w, 3]
        "levels": jnp.asarray(SPECULAR_LEVELS, dtype=jnp.float32),
    }


def sample_splitsum_diffuse(ss, normals):
    return sample_equirect_bilinear(ss["diffuse"], normals)


def sample_splitsum_specular(ss, refl, roughness_sq):
    """Interpolate between roughness mips. roughness_sq: [...,1] in [0,1]."""
    levels = ss["levels"]
    M = levels.shape[0]
    r = jnp.clip(roughness_sq[..., 0], levels[0], levels[-1])
    idx = jnp.searchsorted(levels, r, side="right") - 1
    idx = jnp.clip(idx, 0, M - 2)
    lo = levels[idx]
    hi = levels[idx + 1]
    w = ((r - lo) / (hi - lo + 1e-9))[..., None]
    # gather the two mips for every shading point
    def lookup(level_idx):
        maps = ss["specular"][level_idx]  # [..., h, w, 3] gathered per point
        return maps

    # sample both mips by interpolating the *results*
    all_lo = sample_equirect_bilinear_batchmap(ss["specular"], idx, refl)
    all_hi = sample_equirect_bilinear_batchmap(ss["specular"], idx + 1, refl)
    return all_lo * (1 - w) + all_hi * w


def sample_equirect_bilinear_batchmap(stack: jnp.ndarray, level_idx: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup where each point indexes its own mip level.
    stack: [M,H,W,3]; level_idx: [...]; directions: [...,3]."""
    M, H, W, _ = stack.shape
    u, v = equirect_uv(directions)
    x = u * W - 0.5
    y = jnp.clip(v * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) % W
    x1i = (x0.astype(jnp.int32) + 1) % W
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    li = jnp.clip(level_idx, 0, M - 1)
    c00 = stack[li, y0i, x0i]
    c01 = stack[li, y0i, x1i]
    c10 = stack[li, y1i, x0i]
    c11 = stack[li, y1i, x1i]
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


# ---------------------------------------------------------------------------
# FG LUT: split-sum BRDF table, computed instead of shipped
# (replaces load/lights/bsdf_256_256.bin, dreammat_material.py:405-410)
# ---------------------------------------------------------------------------

def compute_fg_lut(res: int = 256, n_samples: int = 512) -> jnp.ndarray:
    """Karis split-sum: for (NoV, roughness) return (scale, bias) for F0.
    Output [res, res, 2]; u axis = NoV, v axis = roughness (linear, matching
    the clamp(cat([n_dot_v, roughness])) lookup in shade_splitsum)."""
    nov = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    rough = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res

    # Hammersley sequence
    i = np.arange(n_samples)
    u1 = (i + 0.5) / n_samples
    bits = i.astype(np.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    u2 = bits.astype(np.float64) * 2.3283064365386963e-10
    u1 = jnp.asarray(u1, dtype=jnp.float32)
    u2 = jnp.asarray(u2, dtype=jnp.float32)

    def one_cell(NoV, r):
        a = r * r  # LUT roughness axis is *linear* roughness; alpha = r^2
        V = jnp.asarray([jnp.sqrt(1.0 - NoV * NoV), 0.0, NoV])
        phi = 2.0 * jnp.pi * u1
        cos_t = jnp.sqrt((1.0 - u2) / (1.0 + (a * a - 1.0) * u2 + 1e-9))
        sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t**2, 0.0, 1.0))
        Hv = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)
        L = 2.0 * jnp.sum(V * Hv, -1, keepdims=True) * Hv - V
        NoL = jnp.clip(L[:, 2], 0.0, 1.0)
        NoH = jnp.clip(Hv[:, 2], 0.0, 1.0)
        VoH = jnp.clip(jnp.sum(V * Hv, -1), 0.0, 1.0)
        # Schlick-GGX geometry with k = a/2 (IBL variant)
        k = a / 2.0
        g1 = NoL / (NoL * (1 - k) + k + 1e-7)
        g2 = NoV / (NoV * (1 - k) + k + 1e-7)
        G = g1 * g2
        G_vis = G * VoH / (NoH * NoV + 1e-7)
        Fc = (1.0 - VoH) ** 5
        valid = NoL > 0
        A = jnp.where(valid, (1 - Fc) * G_vis, 0.0).mean()
        B = jnp.where(valid, Fc * G_vis, 0.0).mean()
        return jnp.stack([A, B])

    f = jax.vmap(jax.vmap(one_cell, in_axes=(None, 0)), in_axes=(0, None))
    return f(nov, rough)  # [NoV, rough, 2] -> indexed [u=NoV, v=rough]


def sample_fg_lut(lut: jnp.ndarray, n_dot_v: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LUT fetch; inputs [...,1] clamped to [0,1]; out [...,2]."""
    res = lut.shape[0]
    u = jnp.clip(n_dot_v[..., 0], 0.0, 1.0) * (res - 1)
    v = jnp.clip(roughness[..., 0], 0.0, 1.0) * (res - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.clip(u0 + 1, 0, res - 1)
    v1 = jnp.clip(v0 + 1, 0, res - 1)
    wu = (u - u0)[..., None]
    wv = (v - v0)[..., None]
    return (
        lut[u0, v0] * (1 - wu) * (1 - wv)
        + lut[u1, v0] * wu * (1 - wv)
        + lut[u0, v1] * (1 - wu) * wv
        + lut[u1, v1] * wu * wv
    )
