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
    # translation-equivariance of the conv tower: shifting a bright block
    # by 8 px shifts the finest side map by 8 px (pure conv path, no
    # global pooling) — a value property no shape check can fake
    img = jnp.zeros((1, 64, 64, 3)).at[:, 16:24, 16:24, :].set(1.0)
    img_sh = jnp.zeros((1, 64, 64, 3)).at[:, 24:32, 16:24, :].set(1.0)
    s0 = np.asarray(det.hed_side_maps(params, img)[0])
    s0_sh = np.asarray(det.hed_side_maps(params, img_sh)[0])
    inner = s0[0, 8:48, 8:48, 0]
    inner_sh = s0_sh[0, 16:56, 8:48, 0]
    assert np.allclose(inner, inner_sh, atol=1e-4)
    assert float(np.abs(inner).max()) > 0


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


# ---------------------------------------------------------------------------
# NormalBae
# ---------------------------------------------------------------------------

def test_normalbae_forward_shapes_and_unit_normals():
    params = det.init_normalbae_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    preds = det.normalbae_forward(params, x)
    assert [tuple(p.shape) for p in preds] == [
        (1, 8, 8, 4), (1, 16, 16, 4), (1, 32, 32, 4), (1, 64, 64, 4)]
    for p in preds:
        n = np.asarray(p)[..., :3]
        assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
        assert (np.asarray(p)[..., 3] > 0.01 - 1e-6).all()  # kappa positive
    d = det.NormalBaeDetector(params)
    img = np.asarray(d(jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 3))))
    assert img.shape == (32, 32, 3)
    assert (img >= 0).all() and (img <= 1).all()


def test_normalbae_up_align_corners_matches_torch():
    """align_corners=True bilinear against the torch oracle."""
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
    ours = np.asarray(det._up_align_corners(jnp.asarray(x), 10, 14))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    assert np.allclose(ours, ref, atol=1e-5)


def test_normalbae_torch_key_map_bijective_and_loads():
    """Synthesized scannet.pt (NNET/GN names+shapes) loads with every
    mapped key consumed, shapes preserved, transposes correct."""
    params = det.init_normalbae_params(jax.random.PRNGKey(0))
    kmap = det.normalbae_torch_key_map("GN")

    # flax-side completeness: every array leaf is covered by the map
    def paths(tree, prefix=""):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "architecture":
                    continue
                out.update(paths(v, f"{prefix}{k}/"))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                out.update(paths(v, f"{prefix}{i}/"))
        else:
            out[prefix[:-1]] = tree
        return out

    flat = paths(params)
    assert set(flat.keys()) == set(kmap.keys())
    # torch-side names unique
    tnames = [v[0] for v in kmap.values()]
    assert len(tnames) == len(set(tnames))

    # synthesize the torch state dict from the flax shapes
    rs = np.random.RandomState(0)
    sd = {}
    for fpath, (tkey, is_conv) in kmap.items():
        shp = tuple(flat[fpath].shape)
        if is_conv:
            if "out_conv_res" in fpath and fpath.split("/")[-2].isdigit():
                tshape = (shp[3], shp[2], 1)          # Conv1d [co,ci,1]
            else:
                tshape = (shp[3], shp[2], shp[0], shp[1])
        else:
            tshape = shp
        sd[tkey] = rs.randn(*tshape).astype(np.float32)

    import io
    import os
    import tempfile

    import torch

    buf = io.BytesIO()
    torch.save({"model": {f"module.{k}": torch.from_numpy(v)
                          for k, v in sd.items()}}, buf)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "scannet.pt")
        with open(p, "wb") as fh:
            fh.write(buf.getvalue())
        d = det.load_normalbae(p)

    got = paths(d.params)
    assert {k: tuple(v.shape) for k, v in got.items()} == {
        k: tuple(v.shape) for k, v in flat.items()}
    # regular conv transpose round-trip
    w_t = sd["decoder.conv2.weight"]
    assert np.allclose(np.asarray(got["decoder/conv2/w"]),
                       w_t.transpose(2, 3, 1, 0))
    # depthwise conv: torch [c,1,kh,kw] -> flax [kh,kw,1,c]
    w_t = sd["encoder.original_model.blocks.0.0.conv_dw.weight"]
    assert w_t.shape[1] == 1
    assert np.allclose(np.asarray(got["encoder/blocks_0_0/conv_dw/w"]),
                       w_t.transpose(2, 3, 1, 0))
    # conv1d head: torch [co,ci,1] -> flax [1,1,ci,co]
    w_t = sd["decoder.out_conv_res4.0.weight"]
    assert np.allclose(np.asarray(got["decoder/out_conv_res4/0/w"]),
                       w_t.transpose(2, 1, 0)[None])


def test_normalbae_encoder_channel_progression():
    """Skip channels must match the NNET decoder contract
    (24/40/64/176 + 2048 pre-bn2 head)."""
    params = det.init_normalbae_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    s0, s1, s2, s4, head = det.efficientnet_b5_features(params["encoder"], x)
    assert s0.shape == (1, 32, 32, 24)
    assert s1.shape == (1, 16, 16, 40)
    assert s2.shape == (1, 8, 8, 64)
    assert s4.shape == (1, 4, 4, 176)
    assert head.shape == (1, 2, 2, 2048)
    # the full NNET forward produces unit normals with positive kappa
    # (norm_normalize contract) and responds to the input
    pred = det.normalbae_forward(params, x)[-1]
    n = np.asarray(pred[..., :3], np.float32)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)
    assert float(pred[..., 3].min()) > 1.0  # elu(kappa)+1.01 > 1
    pred2 = det.normalbae_forward(
        params, jnp.ones((1, 64, 64, 3)) * 0.7)[-1]
    assert not np.allclose(np.asarray(pred), np.asarray(pred2))
