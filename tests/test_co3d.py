"""CO3D datamodule: annotations parsing, camera conversion, crops, rays."""

import gzip
import json
import os

import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.data  # noqa: F401


def _write_co3d(root, n_frames=4, hw=(40, 32)):
    """Mini CO3D tree: <root>/<cat>/<seq>/ + frame_annotations.jgz."""
    from PIL import Image

    H, W = hw
    cat = os.path.join(root, "apple")
    seq_dir = os.path.join(cat, "seq1")
    os.makedirs(os.path.join(seq_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "masks"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "depths"), exist_ok=True)
    frames = []
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        # camera at radius 3 looking at origin, PyTorch3D convention:
        # world->cam: X_cam = X R^T + T  (row-vector); store R, T such that
        # the loader's pose (R, -R T) @ diag(-1,-1,1,1) is a sane c2w
        pos = np.array([3 * np.cos(a), 3 * np.sin(a), 1.0], np.float32)
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        # OpenCV c2w: x right, y down, z forward
        c2w_cv = np.eye(4, dtype=np.float32)
        c2w_cv[:3, 0], c2w_cv[:3, 1], c2w_cv[:3, 2], c2w_cv[:3, 3] = \
            right, -up2, fwd, pos
        # invert the loader's transform chain: pose_cv = pose_p3d @ cam_trans
        cam_trans = np.diag(np.array([-1, -1, 1, 1], np.float32))
        pose_p3d = c2w_cv @ cam_trans  # cam_trans is its own inverse
        R = pose_p3d[:3, :3]
        T = (-np.linalg.inv(R) @ pose_p3d[:3, 3])[..., None][:, 0]

        img = np.zeros((H, W, 3), np.uint8)
        img[10:30, 8:24] = rng.randint(50, 255, (20, 16, 3))
        ip = f"apple/seq1/images/frame{i:03d}.jpg"
        Image.fromarray(img).save(os.path.join(root, ip))
        mask = np.zeros((H, W), np.uint8)
        mask[10:30, 8:24] = 255
        mp = f"apple/seq1/masks/frame{i:03d}.png"
        Image.fromarray(mask).save(os.path.join(root, mp))
        depth16 = np.full((H, W), 3.0, np.float16)
        dp = f"apple/seq1/depths/frame{i:03d}.png"
        Image.fromarray(
            np.frombuffer(depth16.tobytes(), np.uint16).reshape(H, W)
        ).save(os.path.join(root, dp))
        frames.append({
            "sequence_name": "seq1",
            "meta": {"frame_type": "train"},
            "image": {"path": ip, "size": [H, W]},
            "mask": {"path": mp},
            "depth": {"path": dp, "scale_adjustment": 1.0},
            "viewpoint": {
                "focal_length": [2.0, 2.0],
                "principal_point": [0.0, 0.0],
                "R": R.tolist(),
                "T": T.tolist(),
            },
        })
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "w") as f:
        f.write(json.dumps(frames).encode())
    return seq_dir


def test_co3d_depth_roundtrip(tmp_path):
    from dreammat_tpu.data.co3d import load_16bit_png_depth
    from PIL import Image

    d = np.random.RandomState(0).rand(12, 10).astype(np.float16) * 5
    p = str(tmp_path / "d.png")
    Image.fromarray(
        np.frombuffer(d.tobytes(), np.uint16).reshape(12, 10)
    ).save(p)
    back = load_16bit_png_depth(p)
    assert np.allclose(back, d.astype(np.float32), atol=1e-3)


def test_similarity_normalization():
    from dreammat_tpu.data.co3d import similarity_from_cameras

    rng = np.random.RandomState(0)
    c2w = np.stack([np.eye(4, dtype=np.float32)] * 8)
    for i in range(8):
        a = 2 * np.pi * i / 8
        pos = np.array([5 * np.cos(a), 5 * np.sin(a), 2.0])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        c2w[i, :3, 0], c2w[i, :3, 1] = right, -np.cross(right, fwd)
        c2w[i, :3, 2], c2w[i, :3, 3] = fwd, pos
    T, s = similarity_from_cameras(c2w, radius=1.0)
    out = T @ c2w
    out[:, :3, 3] *= s
    d = np.linalg.norm(out[:, :3, 3], axis=-1)
    assert abs(np.median(d) - 1.0) < 1e-3


def test_co3d_datamodule(tmp_path):
    seq = _write_co3d(str(tmp_path))
    dm = dreammat_tpu.find("co3d-datamodule")(
        {
            "root_dir": seq, "height": 24, "width": 24,
            "box_crop": True, "use_random_camera": True,
            "random_camera": {
                "height": 24, "width": 24, "eval_height": 24,
                "eval_width": 24, "n_test_views": 2,
            },
        },
        None, None,
    )
    dm.setup()
    assert dm.n_frames == 4
    b = dm.collate(0)
    assert b["rays_o"].shape == (24 * 24, 3)
    assert b["rgb"].shape == (24, 24, 3)
    assert b["mask"].shape == (24, 24, 1)
    # ray directions are unit vectors (stronger than finite)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b["rays_d"]), axis=-1), 1.0, atol=1e-4)
    # cameras normalized to ~unit radius and rays aim at the object
    o = np.asarray(b["rays_o"])[0]
    assert 0.3 < np.linalg.norm(o) < 3.0
    d = np.asarray(b["rays_d"]).reshape(24, 24, 3)[12, 12]
    assert np.dot(d, -o / np.linalg.norm(o)) > 0.5
    assert "random_camera" in b
    ev = dm.eval_rays(0)
    assert ev["rays_o"].shape[:2] == (24, 24)
