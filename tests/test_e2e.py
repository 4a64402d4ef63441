"""End-to-end smoke: tiny config, procedural mesh, 2 train steps, test render,
export. The 'strawberry at tiny res' regression of SURVEY §4."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    # write a small OBJ (octahedron-ish sphere) to exercise the mesh loader
    from dreammat_tpu.models.mesh import make_icosphere

    m = make_icosphere(1)
    obj = tmp / "sphere.obj"
    with open(obj, "w") as f:
        for v in np.asarray(m.v_pos):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in np.asarray(m.t_pos_idx):
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")

    import dreammat_tpu
    import dreammat_tpu.data  # noqa: F401
    import dreammat_tpu.models  # noqa: F401
    import dreammat_tpu.systems  # noqa: F401
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreammat_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a red apple",
            f"system.geometry.shape_init=mesh:{obj}",
            f"exp_root_dir={tmp}/outputs",
            "trainer.max_steps=2",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    datamodule = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    datamodule.setup()
    state = system.fit(
        datamodule, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    return cfg, system, datamodule, state


def test_training_updates_params(tiny_run):
    cfg, system, dm, state = tiny_run
    assert int(state["step"]) == 2
    # hashgrid table moved away from init
    import jax

    params0 = system.geometry.init(jax.random.PRNGKey(0))
    diff = float(abs(np.asarray(state["geo"]["table"]) - np.asarray(params0["table"])).sum())
    # training must actually move the hashgrid table (a no-op optimizer or a
    # zero SDS grad would leave diff == 0)
    assert 0.0 < diff < 1e6, diff  # moved, bounded (subsumes finite)
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)


def test_validation_and_test_render(tiny_run):
    cfg, system, dm, state = tiny_run
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)
    gif = system.test(state, dm, cfg.trial_dir, 2, n_views=2)
    assert os.path.exists(gif)


def test_checkpoint_roundtrip(tiny_run, tmp_path):
    import jax

    from dreammat_tpu.utils.ckpt import load_checkpoint, save_checkpoint

    cfg, system, dm, state = tiny_run
    p = save_checkpoint(str(tmp_path / "ck"), state, int(state["step"]))
    state2, step = load_checkpoint(p)
    assert step == 2
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state2)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_export_obj(tiny_run):
    cfg, system, dm, state = tiny_run
    # small texture for CI speed
    from dreammat_tpu.models.exporter import MeshExporter

    exporter = MeshExporter({"texture_size": 64}, system.geometry, system.material)
    out = exporter.export_obj_with_mtl(state["geo"], os.path.join(cfg.trial_dir, "export"))
    assert os.path.exists(out)
    txt = open(out).read()
    assert "mtllib" in txt and txt.count("\nf ") > 10
    mtl = os.path.join(os.path.dirname(out), "model.mtl")
    mtl_txt = open(mtl).read()
    assert "map_Kd" in mtl_txt and "map_Pm" in mtl_txt and "map_Pr" in mtl_txt


def test_hybrid_mc_training(tmp_path):
    """Two steps with hybrid_mc_every=2: step 0 shades exact-MC (no
    table), step 1 uses the tables — both variants of the jitted train
    step run in one fit."""
    import dreammat_tpu
    from dreammat_tpu.models.mesh import make_icosphere
    from dreammat_tpu.utils.config import load_config

    m = make_icosphere(1)
    obj = tmp_path / "sphere.obj"
    with open(obj, "w") as f:
        for v in np.asarray(m.v_pos):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in np.asarray(m.t_pos_idx):
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreammat_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a red apple",
            f"system.geometry.shape_init=mesh:{obj}",
            f"exp_root_dir={tmp_path}/outputs",
            "data.hybrid_mc_every=2",
            "trainer.max_steps=2",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    assert dm.data.table_spec is not None  # tables exist; interleave skips them
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    leaves = np.concatenate([
        np.asarray(l).ravel()
        for l in __import__("jax").tree_util.tree_leaves(state["geo"])
    ])
    assert float(np.abs(leaves).max()) < 1e6  # bounded subsumes finite


# SURVEY §4 fixed-seed regression: pins the eval render after the 2 fixed-seed
# train steps of `tiny_run` to a coarse fingerprint (4x4 block means x RGB).
# Regenerate after an INTENTIONAL behavior change with:
#   DREAMMAT_REGEN_GOLDEN=1 python -m pytest tests/test_e2e.py::test_fixed_seed_render_fingerprint -s
_RENDER_GOLDEN = np.array([
    0.997742, 0.998492, 0.999564, 0.910555, 0.949541, 0.995047, 0.914133,
    0.949545, 0.995120, 0.997969, 0.998737, 0.999783, 0.890328, 0.918821,
    0.959858, 0.771996, 0.847852, 0.948509, 0.766517, 0.844128, 0.946471,
    0.930380, 0.952531, 0.981007, 0.890000, 0.908126, 0.935077, 0.733737,
    0.783035, 0.852875, 0.730329, 0.780403, 0.852602, 0.887935, 0.907302,
    0.936172, 0.998683, 0.998800, 0.998979, 0.874054, 0.881108, 0.892575,
    0.869020, 0.876017, 0.887657, 0.997480, 0.997688, 0.998034,
])


def test_fixed_seed_render_fingerprint(tiny_run):
    import jax

    cfg, system, dm, state = tiny_run
    batch = dm.eval_view(0)
    out = (system._render_fn or system.make_render_fn())(
        state["geo"], batch["gbuffer"], batch["env_id"],
        jax.random.PRNGKey(0), batch.get("light_table"),
    )
    rgb = np.asarray(out["comp_rgb"], np.float64)
    H, W, _ = rgb.shape
    fp = rgb.reshape(4, H // 4, 4, W // 4, 3).mean(axis=(1, 3)).ravel()
    if os.environ.get("DREAMMAT_REGEN_GOLDEN"):
        print("\n_RENDER_GOLDEN = np.array([" +
              ", ".join(f"{v:.6f}" for v in fp) + "])")
        return
    assert _RENDER_GOLDEN is not None, "golden not generated yet"
    assert fp.shape == _RENDER_GOLDEN.shape
    # loose tolerance: catches silent semantic changes, ignores fp noise
    assert np.abs(fp - _RENDER_GOLDEN).max() < 0.02, (
        np.abs(fp - _RENDER_GOLDEN).max(), fp.tolist())
