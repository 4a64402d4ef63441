"""HED detector rebuild (models/detectors.py) vs the controlnet_aux
semantics the reference depends on (csd_guidance.py:115-120,636-641)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.models import detectors as det


def test_hed_side_map_strides():
    params = det.init_hed_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    sides = det.hed_side_maps(params, x)
    assert [s.shape[1] for s in sides] == [64, 32, 16, 8, 4]
    assert all(s.shape[-1] == 1 for s in sides)


def test_hed_detector_output_range_and_shape():
    d = det.load_hed()
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (48, 48, 3))
    out = d(rgb)
    assert out.shape == (48, 48, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # scribble variant is binary
    outs = d(rgb, scribble=True)
    u = np.unique(np.asarray(outs))
    assert set(u.tolist()) <= {0.0, 1.0}


def test_scribble_nms_thins_blobs():
    """An isotropic bump must binarize to the thin cross/diagonal skeleton
    through its peak, not the whole >thresh disk — a pixel survives only
    where it is the max of a 3-tap line through it (annotator nms).
    (A band constant along one direction is kept whole — cv2's version
    does the same, the directional dilate equals the image there.)"""
    H = W = 33
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    r2 = (ys - 16.0) ** 2 + (xs - 16.0) ** 2
    bump = np.exp(-0.5 * r2 / 6.0 ** 2).astype(np.float32)
    out = np.asarray(det.scribble_nms(jnp.asarray(bump), thresh=0.3,
                                      sigma=1.0))
    kept = int(out.sum())
    assert kept >= 1
    # blurred bump stays peaked at the center; the >thresh disk is wide
    disk = int((np.asarray(det._gaussian_blur(jnp.asarray(bump), 1.0))
                > 0.3).sum())
    assert kept < disk / 2
    # the peak itself survives (it is the max of every line through it)
    assert out[16, 16] > 0


def test_hed_torch_key_map_is_bijective_and_loads():
    """Synthesized ControlNetHED.pth state dict (public architecture's
    names+shapes) loads with every key consumed and matching shapes."""
    sd = {"norm": np.zeros((1, 3, 1, 1), np.float32)}
    for bi, (ci, co, n) in enumerate(det._HED_BLOCKS):
        for li in range(n):
            cin = ci if li == 0 else co
            sd[f"block{bi+1}.convs.{li}.weight"] = np.random.RandomState(
                bi * 10 + li).randn(co, cin, 3, 3).astype(np.float32)
            sd[f"block{bi+1}.convs.{li}.bias"] = np.zeros((co,), np.float32)
        sd[f"block{bi+1}.projection.weight"] = np.random.RandomState(
            bi).randn(1, co, 1, 1).astype(np.float32)
        sd[f"block{bi+1}.projection.bias"] = np.zeros((1,), np.float32)

    import io

    import torch

    buf = io.BytesIO()
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, buf)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ControlNetHED.pth")
        with open(p, "wb") as fh:
            fh.write(buf.getvalue())
        d = det.load_hed(p)

    # every torch key is consumed by the mapping
    mapped = {v[0] for v in det.hed_torch_key_map(d.params).values()}
    assert mapped == set(sd.keys())
    # loaded shapes match the flax layout
    ref = det.init_hed_params(jax.random.PRNGKey(0))
    flat_a = jax.tree_util.tree_map(lambda x: x.shape, d.params)
    flat_b = jax.tree_util.tree_map(lambda x: x.shape, ref)
    assert flat_a == flat_b
    # and values round-trip (transpose applied correctly)
    w_t = sd["block1.convs.0.weight"]            # [co,ci,kh,kw]
    w_j = np.asarray(d.params["block1"]["conv0"]["w"])  # [kh,kw,ci,co]
    assert np.allclose(w_j, w_t.transpose(2, 3, 1, 0))
