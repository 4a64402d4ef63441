"""Condition-map detectors for the public-ControlNet guidance.

TPU-native rebuild of the ``controlnet_aux`` preprocessors the reference
downloads at runtime (csd_guidance.py:31,100-120,609-651):

- **HED** (``HEDdetector`` over ``ControlNetHED_Apache2``): 5 VGG-style
  conv stages, each emitting a 1-channel side map through a 1x1
  projection; the side maps are upsampled, averaged, and squashed by a
  sigmoid. The scribble variant then runs the annotator ``nms``
  (gaussian blur + 4-direction max suppression + threshold). Everything
  — convs, gaussian, directional dilations — runs as XLA ops in one
  jittable function, instead of controlnet_aux's torch-forward +
  cv2-postprocess host round-trip.
- **NormalBae** (EfficientNet-B5 + hierarchical normal/kappa decoder):
  from-scratch rebuild of the NNET surface-normal estimator behind
  controlnet_aux's ``NormalBaeDetector`` (scannet.pt); weight-gated like
  HED — see the NormalBae section below.

The architecture is the public lllyasviel/Annotators ``ControlNetHED``
graph; ``hed_torch_key_map`` maps its state-dict names so the real
``ControlNetHED.pth`` drops in through the standard converter. Without
weights the detector runs random-init (tests exercise the full path;
real edge quality obviously needs the checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (in_ch, out_ch, n_convs) per block — ControlNetHED_Apache2
_HED_BLOCKS: Tuple[Tuple[int, int, int], ...] = (
    (3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3),
)


def init_hed_params(rng: jax.Array) -> Dict[str, Any]:
    """Random-init HED parameter pytree (NHWC conv kernels [kh,kw,ci,co])."""
    params: Dict[str, Any] = {"norm": jnp.zeros((1, 1, 1, 3), jnp.float32)}
    for bi, (ci, co, n) in enumerate(_HED_BLOCKS):
        blk: Dict[str, Any] = {}
        for li in range(n):
            rng, k = jax.random.split(rng)
            cin = ci if li == 0 else co
            fan = 9 * cin
            blk[f"conv{li}"] = {
                "w": jax.random.normal(k, (3, 3, cin, co)) * (2.0 / fan) ** 0.5,
                "b": jnp.zeros((co,)),
            }
        rng, k = jax.random.split(rng)
        blk["projection"] = {
            "w": jax.random.normal(k, (1, 1, co, 1)) * co ** -0.5,
            "b": jnp.zeros((1,)),
        }
        params[f"block{bi + 1}"] = blk
    return params


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def hed_side_maps(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """ControlNetHED forward: input [B,H,W,3] in 0..255 RGB float, minus
    the learned ``norm``; returns the 5 projection maps (logits) at their
    native strides."""
    h = x - params["norm"]
    sides = []
    for bi, (_, _, n) in enumerate(_HED_BLOCKS):
        blk = params[f"block{bi + 1}"]
        if bi > 0:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for li in range(n):
            h = jax.nn.relu(_conv(h, blk[f"conv{li}"]))
        sides.append(_conv(h, blk["projection"]))
    return sides


def _gaussian_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """cv2.GaussianBlur(ksize=(0,0), sigma): kernel radius from sigma."""
    radius = max(int(round(sigma * 3.0)), 1)
    t = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k = jnp.asarray(k / k.sum())
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="same"))(x)
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="same"),
                 in_axes=1, out_axes=1)(x)
    return x


def _directional_max(x: jnp.ndarray, offsets) -> jnp.ndarray:
    """Max over the 3-tap line through each pixel (annotator dilate with a
    1x3 structuring element along the given direction)."""
    out = x
    for dy, dx in offsets:
        out = jnp.maximum(out, jnp.roll(x, (dy, dx), axis=(0, 1)))
    return out


def scribble_nms(edge: jnp.ndarray, thresh: float = 127.0 / 255.0,
                 sigma: float = 3.0) -> jnp.ndarray:
    """annotator.util.nms + the scribble binarization
    (controlnet_aux HEDdetector.__call__ scribble=True): keep pixels that
    are the max of some 3-tap directional line through them after a
    gaussian blur, threshold, binarize."""
    z = _gaussian_blur(edge, sigma)
    y = jnp.zeros_like(z)
    for offs in (
        ((0, -1), (0, 1)),      # horizontal
        ((-1, 0), (1, 0)),      # vertical
        ((-1, -1), (1, 1)),     # diagonal
        ((-1, 1), (1, -1)),     # anti-diagonal
    ):
        d = _directional_max(z, offs)
        y = jnp.where(d == z, z, y)
    return (y > thresh).astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
class HEDdetector:
    """Callable detector: [H,W,3] RGB in [0,1] -> [H,W,3] control map in
    [0,1] (the reference feeds the detected map back as a 3-channel
    control image, csd_guidance.py:636-641)."""

    def __init__(self, params: Dict[str, Any]):
        self.params = params

    def tree_flatten(self):
        return (self.params,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def __call__(self, rgb: jnp.ndarray, scribble: bool = False) -> jnp.ndarray:
        H, W = rgb.shape[:2]
        x = rgb[None] * 255.0
        sides = hed_side_maps(self.params, x)
        ups = [
            jax.image.resize(s[0, ..., 0], (H, W), method="linear")
            for s in sides
        ]
        edge = jax.nn.sigmoid(jnp.mean(jnp.stack(ups), axis=0))
        if scribble:
            edge = scribble_nms(edge)
        return jnp.repeat(edge[..., None], 3, axis=-1)


def hed_torch_key_map(params: Dict[str, Any]) -> Dict[str, Tuple[str, bool]]:
    """flax path -> (torch state-dict key, transpose_conv) for
    lllyasviel/Annotators ControlNetHED.pth. Torch convs are [co,ci,kh,kw];
    ours [kh,kw,ci,co]."""
    out: Dict[str, Tuple[str, bool]] = {"norm": ("norm", False)}
    for bi, (_, _, n) in enumerate(_HED_BLOCKS):
        for li in range(n):
            out[f"block{bi+1}/conv{li}/w"] = (
                f"block{bi+1}.convs.{li}.weight", True)
            out[f"block{bi+1}/conv{li}/b"] = (
                f"block{bi+1}.convs.{li}.bias", False)
        out[f"block{bi+1}/projection/w"] = (
            f"block{bi+1}.projection.weight", True)
        out[f"block{bi+1}/projection/b"] = (
            f"block{bi+1}.projection.bias", False)
    return out


def load_hed(weights_path: str = None, rng: jax.Array = None) -> HEDdetector:
    """Weight-gated constructor: real ``ControlNetHED.pth`` when given,
    random-init otherwise (plumbing tests / no-weights images)."""
    params = init_hed_params(
        rng if rng is not None else jax.random.PRNGKey(0)
    )
    if weights_path:
        from dreammat_tpu.models.diffusion import convert

        sd = convert.load_torch_state_dict(weights_path)
        new: Dict[str, Any] = {
            "norm": jnp.asarray(
                np.asarray(sd["norm"], np.float32).reshape(1, 1, 1, 3)
            )
        }
        for bi, (_, _, n) in enumerate(_HED_BLOCKS):
            blk = {}
            for li in range(n):
                w = np.asarray(sd[f"block{bi+1}.convs.{li}.weight"], np.float32)
                blk[f"conv{li}"] = {
                    "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                    "b": jnp.asarray(
                        np.asarray(sd[f"block{bi+1}.convs.{li}.bias"],
                                   np.float32)),
                }
            w = np.asarray(sd[f"block{bi+1}.projection.weight"], np.float32)
            blk["projection"] = {
                "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(
                    np.asarray(sd[f"block{bi+1}.projection.bias"], np.float32)),
            }
            new[f"block{bi+1}"] = blk
        params = new
    return HEDdetector(params)


# ---------------------------------------------------------------------------
# NormalBae: EfficientNet-B5 encoder + hierarchical normal/kappa decoder
# ---------------------------------------------------------------------------
# Rebuild of the surface-normal estimator behind controlnet_aux's
# ``NormalBaeDetector`` (reference csd_guidance.py:103-120 downloads
# lllyasviel/Annotators ``scannet.pt`` = the NNET model of Bae et al.,
# "Estimating and Exploiting the Aleatoric Uncertainty in Surface Normal
# Estimation", with architecture=GN):
#
# - encoder: geffnet ``tf_efficientnet_b5_ap`` (stem 48 -> 7 MBConv stages
#   -> conv_head 2048); skip features are the outputs of stages 0/1/2/4
#   and the PRE-bn2 conv_head (the torch Encoder collects raw module
#   outputs, so bn2/act2 are bypassed).
# - decoder: 1x1 bottleneck conv + 4 UpSample blocks (weight-standardized
#   convs + GroupNorm(8) + LeakyReLU for the GN architecture shipped as
#   scannet.pt), then hierarchical heads: a 3x3 conv at 1/8 and three
#   1x1-conv MLPs at 1/4, 1/2, 1/1 that refine cat(upsampled features,
#   upsampled previous prediction). Outputs are (nx,ny,nz,kappa) with
#   norm_normalize (unit normal + elu(kappa)+1.01).
#
# TF-style "SAME" padding of the tf_ weights is XLA's native SAME
# semantics, so no Conv2dSame shim is needed. Weight-gated like HED:
# without scannet.pt the detector runs random-init (plumbing only).

# (n_blocks, kernel, stride, expand_ratio, c_in, c_out) per stage
_B5_STAGES: Tuple[Tuple[int, int, int, int, int, int], ...] = (
    (3, 3, 1, 1, 48, 24),
    (5, 3, 2, 6, 24, 40),
    (5, 5, 2, 6, 40, 64),
    (7, 3, 2, 6, 64, 128),
    (7, 5, 1, 6, 128, 176),
    (9, 5, 2, 6, 176, 304),
    (3, 3, 1, 6, 304, 512),
)
_B5_STEM = 48
_B5_HEAD = 2048
# decoder skips: (stage outputs used, channels) — see Encoder.forward
_DEC_SKIPS = (24, 40, 64, 176)  # 1/2, 1/4, 1/8, 1/16
_DEC_UPS = ((2048 + 176, 1024), (1024 + 64, 512), (512 + 40, 256), (256 + 24, 128))
_DEC_HEADS = {"res4": 512 + 4, "res2": 256 + 4, "res1": 128 + 4}

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _conv_init(rng, kh, kw, ci, co):
    fan = kh * kw * ci
    return jax.random.normal(rng, (kh, kw, ci, co)) * (2.0 / fan) ** 0.5


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _gn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def init_normalbae_params(rng: jax.Array, architecture: str = "GN") -> Dict[str, Any]:
    """Random-init NormalBae parameter pytree (NHWC kernels; depthwise
    kernels [kh,kw,1,c] for feature_group_count=c)."""
    p: Dict[str, Any] = {"architecture": architecture}
    ks = iter(jax.random.split(rng, 4096))
    enc: Dict[str, Any] = {
        "conv_stem": {"w": _conv_init(next(ks), 3, 3, 3, _B5_STEM)},
        "bn1": _bn_init(_B5_STEM),
    }
    for si, (n, k, s, e, ci, co) in enumerate(_B5_STAGES):
        for bi in range(n):
            b_in = ci if bi == 0 else co
            blk: Dict[str, Any] = {}
            if e == 1:  # DepthwiseSeparableConv (stage 0)
                blk["conv_dw"] = {"w": _conv_init(next(ks), k, k, 1, b_in)}
                blk["bn1"] = _bn_init(b_in)
                r = max(1, int(b_in * 0.25))
                blk["se"] = {
                    "conv_reduce": {"w": _conv_init(next(ks), 1, 1, b_in, r),
                                    "b": jnp.zeros((r,))},
                    "conv_expand": {"w": _conv_init(next(ks), 1, 1, r, b_in),
                                    "b": jnp.zeros((b_in,))},
                }
                blk["conv_pw"] = {"w": _conv_init(next(ks), 1, 1, b_in, co)}
                blk["bn2"] = _bn_init(co)
            else:  # InvertedResidual
                mid = b_in * e
                blk["conv_pw"] = {"w": _conv_init(next(ks), 1, 1, b_in, mid)}
                blk["bn1"] = _bn_init(mid)
                blk["conv_dw"] = {"w": _conv_init(next(ks), k, k, 1, mid)}
                blk["bn2"] = _bn_init(mid)
                r = max(1, int(b_in * 0.25))
                blk["se"] = {
                    "conv_reduce": {"w": _conv_init(next(ks), 1, 1, mid, r),
                                    "b": jnp.zeros((r,))},
                    "conv_expand": {"w": _conv_init(next(ks), 1, 1, r, mid),
                                    "b": jnp.zeros((mid,))},
                }
                blk["conv_pwl"] = {"w": _conv_init(next(ks), 1, 1, mid, co)}
                blk["bn3"] = _bn_init(co)
            enc[f"blocks_{si}_{bi}"] = blk
    enc["conv_head"] = {"w": _conv_init(next(ks), 1, 1, 512, _B5_HEAD)}
    p["encoder"] = enc

    norm_init = _gn_init if architecture == "GN" else _bn_init
    dec: Dict[str, Any] = {
        "conv2": {"w": _conv_init(next(ks), 1, 1, _B5_HEAD, _B5_HEAD),
                  "b": jnp.zeros((_B5_HEAD,))},
    }
    for ui, (cin, cout) in enumerate(_DEC_UPS):
        dec[f"up{ui + 1}"] = {
            "conv0": {"w": _conv_init(next(ks), 3, 3, cin, cout),
                      "b": jnp.zeros((cout,))},
            "norm0": norm_init(cout),
            "conv1": {"w": _conv_init(next(ks), 3, 3, cout, cout),
                      "b": jnp.zeros((cout,))},
            "norm1": norm_init(cout),
        }
    dec["out_conv_res8"] = {"w": _conv_init(next(ks), 3, 3, 512, 4),
                            "b": jnp.zeros((4,))}
    for name, cin in _DEC_HEADS.items():
        widths = (cin, 128, 128, 128, 4)
        dec[f"out_conv_{name}"] = [
            {"w": _conv_init(next(ks), 1, 1, widths[i], widths[i + 1]),
             "b": jnp.zeros((widths[i + 1],))}
            for i in range(4)
        ]
    p["decoder"] = dec
    return p


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _bn_tf(x, p):
    """Encoder BatchNorm: geffnet's tf_efficientnet_b5_ap is a TF-ported
    model built with BN_EPS_TF_DEFAULT=1e-3 (NOT torch's 1e-5) — with real
    scannet.pt weights the wrong eps compounds across ~100 BN layers."""
    return _bn(x, p, eps=1e-3)


def _gn(x, p, groups: int = 8):
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups)
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + 1e-5)
    return g.reshape(B, H, W, C) * p["scale"] + p["bias"]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv2d(x, p, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["b"] if "b" in p else y


def _ws_conv2d(x, p, stride=1):
    """Weight-standardized conv (the GN architecture's Conv2d: per-output
    -channel weight mean removal + std division, eps 1e-5)."""
    w = p["w"]
    mu = w.mean(axis=(0, 1, 2), keepdims=True)
    w = w - mu
    # torch .std() over the flattened per-out-channel weights (Bessel)
    kh, kw, ci, co = w.shape
    flat = w.reshape(-1, co)
    std = jnp.sqrt(flat.var(axis=0, ddof=1)) + 1e-5
    w = w / std
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _se(x, p):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = _swish(_conv2d(s, p["conv_reduce"]))
    return x * jax.nn.sigmoid(_conv2d(s, p["conv_expand"]))


def efficientnet_b5_features(enc: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """Returns [stage0, stage1, stage2, stage4, conv_head] outputs — the
    five skips the NNET Encoder hands the decoder (features[4,5,6,8,11])."""
    h = _swish(_bn_tf(_conv2d(x, enc["conv_stem"], stride=2), enc["bn1"]))
    skips = []
    for si, (n, k, s, e, ci, co) in enumerate(_B5_STAGES):
        for bi in range(n):
            blk = enc[f"blocks_{si}_{bi}"]
            stride = s if bi == 0 else 1
            b_in = h.shape[-1]
            if e == 1:
                y = _swish(_bn_tf(_conv2d(h, blk["conv_dw"], stride=stride,
                                       groups=b_in), blk["bn1"]))
                y = _se(y, blk["se"])
                y = _bn_tf(_conv2d(y, blk["conv_pw"]), blk["bn2"])
            else:
                y = _swish(_bn_tf(_conv2d(h, blk["conv_pw"]), blk["bn1"]))
                y = _swish(_bn_tf(_conv2d(y, blk["conv_dw"], stride=stride,
                                       groups=y.shape[-1]), blk["bn2"]))
                y = _se(y, blk["se"])
                y = _bn_tf(_conv2d(y, blk["conv_pwl"]), blk["bn3"])
            if stride == 1 and y.shape[-1] == b_in:
                y = y + h
            h = y
        if si in (0, 1, 2, 4):
            skips.append(h)
    skips.append(_conv2d(h, enc["conv_head"]))  # pre-bn2, like the torch Encoder
    return skips


def _up_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear upsample with align_corners=True (torch F.interpolate)."""
    B, H, W, C = x.shape

    def axis_weights(n_in, n_out):
        if n_in == 1:
            return np.zeros(n_out, np.int64), np.zeros(n_out, np.int64), np.zeros(n_out, np.float32)
        src = np.linspace(0.0, n_in - 1.0, n_out)
        i0 = np.floor(src).astype(np.int64)
        i0 = np.clip(i0, 0, n_in - 2)
        return i0, i0 + 1, (src - i0).astype(np.float32)

    y0, y1, wy = axis_weights(H, out_h)
    x0, x1, wx = axis_weights(W, out_w)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top + (bot - top) * jnp.asarray(wy)[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left + (right - left) * jnp.asarray(wx)[None, None, :, None]


def norm_normalize(out: jnp.ndarray) -> jnp.ndarray:
    """(nx,ny,nz,kappa) -> unit normal + positive kappa (NNET utils)."""
    n = out[..., :3]
    kappa = out[..., 3:4]
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / norm, kappa], axis=-1)


def normalbae_forward(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """NNET forward on ImageNet-normalized input [B,H,W,3]; returns the
    four-level prediction list [res8, res4, res2, res1], each [B,h,w,4]
    norm_normalized (inference branch: every head runs on all pixels)."""
    gn_arch = params["architecture"] == "GN"
    conv = _ws_conv2d if gn_arch else _conv2d
    norm = _gn if gn_arch else _bn
    s0, s1, s2, s4, head = efficientnet_b5_features(params["encoder"], x)
    dec = params["decoder"]
    x_d0 = _conv2d(head, dec["conv2"])

    def up_block(p, x_in, skip):
        ux = _up_align_corners(x_in, skip.shape[1], skip.shape[2])
        h = jnp.concatenate([ux, skip], axis=-1)
        h = jax.nn.leaky_relu(norm(conv(h, p["conv0"]), p["norm0"]), 0.01)
        return jax.nn.leaky_relu(norm(conv(h, p["conv1"]), p["norm1"]), 0.01)

    x_d1 = up_block(dec["up1"], x_d0, s4)
    x_d2 = up_block(dec["up2"], x_d1, s2)
    x_d3 = up_block(dec["up3"], x_d2, s1)
    x_d4 = up_block(dec["up4"], x_d3, s0)

    out_res8 = norm_normalize(_conv2d(x_d2, dec["out_conv_res8"]))

    def mlp_head(layers, feat, prev):
        h = jnp.concatenate([
            _up_align_corners(feat, feat.shape[1] * 2, feat.shape[2] * 2),
            _up_align_corners(prev, feat.shape[1] * 2, feat.shape[2] * 2),
        ], axis=-1)
        for i, lp in enumerate(layers):
            h = _conv2d(h, lp)
            if i < len(layers) - 1:
                h = jax.nn.relu(h)
        return norm_normalize(h)

    out_res4 = mlp_head(dec["out_conv_res4"], x_d2, out_res8)
    out_res2 = mlp_head(dec["out_conv_res2"], x_d3, out_res4)
    out_res1 = mlp_head(dec["out_conv_res1"], x_d4, out_res2)
    return [out_res8, out_res4, out_res2, out_res1]


@jax.tree_util.register_pytree_node_class
class NormalBaeDetector:
    """Callable detector: [H,W,3] RGB in [0,1] -> [H,W,3] normal image in
    [0,1] (controlnet_aux convention: (n+1)/2, clipped)."""

    def __init__(self, params: Dict[str, Any]):
        self.params = params

    def tree_flatten(self):
        arch = self.params["architecture"]
        rest = {k: v for k, v in self.params.items() if k != "architecture"}
        return (rest,), arch

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls({"architecture": aux, **children[0]})

    # controlnet_aux resizes to detect_resolution=512 before inference and
    # back after — the estimator must see the scale its weights were tuned
    # for, regardless of the render resolution.
    detect_resolution: int = 512

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        H, W = rgb.shape[:2]
        dr = self.detect_resolution
        x = rgb
        if (H, W) != (dr, dr):
            x = jax.image.resize(x, (dr, dr, 3), method="linear")
        x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
        preds = normalbae_forward(self.params, x[None])
        normal = preds[-1][0, ..., :3]
        img = jnp.clip((normal + 1.0) * 0.5, 0.0, 1.0)
        if (H, W) != (dr, dr):
            img = jax.image.resize(img, (H, W, 3), method="linear")
        return img


def normalbae_torch_key_map(architecture: str = "GN") -> Dict[str, Tuple[str, bool]]:
    """flax path -> (scannet.pt state-dict key, transpose_conv). Conv
    weights are [co,ci,kh,kw] in torch (depthwise [c,1,kh,kw]); BN/GN
    vectors map 1:1. Unconsumed torch keys (bn2/act2 of the encoder tail,
    optimizer state) are ignored by ``load_normalbae``."""
    out: Dict[str, Tuple[str, bool]] = {}
    e = "encoder.original_model."
    out["encoder/conv_stem/w"] = (e + "conv_stem.weight", True)
    for stat, tkey in (("scale", "weight"), ("bias", "bias"),
                       ("mean", "running_mean"), ("var", "running_var")):
        out[f"encoder/bn1/{stat}"] = (e + f"bn1.{tkey}", False)
    bn_map = (("scale", "weight"), ("bias", "bias"),
              ("mean", "running_mean"), ("var", "running_var"))
    for si, (n, k, s, ex, ci, co) in enumerate(_B5_STAGES):
        for bi in range(n):
            t = e + f"blocks.{si}.{bi}."
            f = f"encoder/blocks_{si}_{bi}/"
            convs = (("conv_dw", "conv_pw") if ex == 1
                     else ("conv_pw", "conv_dw", "conv_pwl"))
            bns = (("bn1", "bn2") if ex == 1 else ("bn1", "bn2", "bn3"))
            for c in convs:
                out[f + c + "/w"] = (t + c + ".weight", True)
            for b in bns:
                for stat, tkey in bn_map:
                    out[f + b + f"/{stat}"] = (t + b + f".{tkey}", False)
            for seb in ("conv_reduce", "conv_expand"):
                out[f + f"se/{seb}/w"] = (t + f"se.{seb}.weight", True)
                out[f + f"se/{seb}/b"] = (t + f"se.{seb}.bias", False)
    out["encoder/conv_head/w"] = (e + "conv_head.weight", True)

    d = "decoder."
    out["decoder/conv2/w"] = (d + "conv2.weight", True)
    out["decoder/conv2/b"] = (d + "conv2.bias", False)
    norm_stats = ((("scale", "weight"), ("bias", "bias")) if architecture == "GN"
                  else bn_map)
    for ui in range(4):
        t = d + f"up{ui + 1}._net."
        f = f"decoder/up{ui + 1}/"
        for flax_name, idx in (("conv0", 0), ("conv1", 3)):
            out[f + flax_name + "/w"] = (t + f"{idx}.weight", True)
            out[f + flax_name + "/b"] = (t + f"{idx}.bias", False)
        for flax_name, idx in (("norm0", 1), ("norm1", 4)):
            for stat, tkey in norm_stats:
                out[f + flax_name + f"/{stat}"] = (t + f"{idx}.{tkey}", False)
    out["decoder/out_conv_res8/w"] = (d + "out_conv_res8.weight", True)
    out["decoder/out_conv_res8/b"] = (d + "out_conv_res8.bias", False)
    for name in ("res4", "res2", "res1"):
        for li, idx in enumerate((0, 2, 4, 6)):
            out[f"decoder/out_conv_{name}/{li}/w"] = (
                d + f"out_conv_{name}.{idx}.weight", True)
            out[f"decoder/out_conv_{name}/{li}/b"] = (
                d + f"out_conv_{name}.{idx}.bias", False)
    return out


def load_normalbae(weights_path: str = None, rng: jax.Array = None,
                   architecture: str = "GN") -> NormalBaeDetector:
    """Weight-gated constructor: real ``scannet.pt`` when given (the file
    stores {"model": state_dict}; DataParallel "module." prefixes are
    stripped), random-init otherwise."""
    params = init_normalbae_params(
        rng if rng is not None else jax.random.PRNGKey(0), architecture
    )
    if weights_path:
        from dreammat_tpu.models.diffusion import convert

        sd = convert.load_torch_state_dict(weights_path)
        if "model" in sd and not hasattr(sd["model"], "shape"):
            sd = sd["model"]
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        kmap = normalbae_torch_key_map(architecture)
        flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])

        def assign(tree, path, value):
            node = tree
            for pkey in path[:-1]:
                node = node[pkey]
            node[path[-1]] = value

        for fpath, (tkey, is_conv) in kmap.items():
            w = np.asarray(sd[tkey], np.float32)
            if is_conv:
                if w.shape[1] == 1 and w.shape[0] > 1:  # depthwise [c,1,kh,kw]
                    w = w.transpose(2, 3, 1, 0)
                elif w.ndim == 3:  # conv1d [co,ci,1] -> [1,1,ci,co]
                    w = w.transpose(2, 1, 0)[None]
                else:
                    w = w.transpose(2, 3, 1, 0)
            keys = fpath.split("/")
            keys = [int(k) if k.isdigit() else k for k in keys]
            assign(params, keys, jnp.asarray(w))
    return NormalBaeDetector(params)
