"""mc_pixel training regime: per-pixel baked visibility tables plumbed
through datamodule -> collate -> train step -> MC estimator
(reference exact behavior: dreammat_material.py:490-507 per-ray
visibility; mc_pixel replaces the rays with a per-pixel octahedral bake,
VERDICT r4 next #2 regime table)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pixel_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mc_pixel")
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
            "data.visibility_pixel_tables=true",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    datamodule = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    datamodule.setup()
    # mc_pixel regime: MC estimator (no prefiltered tables), per-pixel vis
    datamodule.data.table_spec = None
    state = system.fit(
        datamodule, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    return system, datamodule, state


def test_pixel_tables_baked_and_batched(pixel_run):
    system, dm, state = pixel_run
    assert dm._pixel_vis is not None and len(dm._pixel_vis) == dm.cfg.fix_view_num
    oct_res = system.renderer.cfg.visibility_oct_res
    P = dm.data.gbuffers[0].fg_pos.shape[0]
    for t in dm._pixel_vis:
        assert t.shape == (P, oct_res * oct_res)
        arr = np.asarray(t, np.float32)
        assert arr.min() >= 0.0 and arr.max() <= 1.0
    batch = dm.collate(0)
    assert batch["pixel_vis"] is not None
    assert batch["light_table"] is None  # tables dropped -> MC estimator


def test_training_moves_params_under_mc_pixel(pixel_run):
    import jax

    system, dm, state = pixel_run
    assert int(state["step"]) == 2
    params0 = system.geometry.init(jax.random.PRNGKey(0))
    diff = float(abs(np.asarray(state["geo"]["table"]) - np.asarray(params0["table"])).sum())
    assert 0.0 < diff < 1e6, diff
    leaves = jax.tree_util.tree_leaves(state["geo"])
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)


def test_pixel_vis_changes_shading_on_occluder(pixel_run):
    """The per-pixel table must actually be consumed: shading with a
    zeroed table (everything occluded) must darken the render vs the
    baked table."""
    import jax
    import jax.numpy as jnp

    system, dm, state = pixel_run
    batch = dm.collate(0)
    rng = jax.random.PRNGKey(7)
    out_lit = system.renderer.shade_view(
        state["geo"], batch["gbuffer"], batch["env_id"], rng,
        is_train=True, pixel_vis=batch["pixel_vis"],
    )
    out_dark = system.renderer.shade_view(
        state["geo"], batch["gbuffer"], batch["env_id"], rng,
        is_train=True, pixel_vis=jnp.zeros_like(batch["pixel_vis"]),
    )
    lit = float(jnp.mean(out_lit["comp_rgb"]))
    dark = float(jnp.mean(out_dark["comp_rgb"]))
    assert lit > dark, (lit, dark)


def test_mc_raytrace_training_two_steps(tmp_path):
    """Exact-visibility (per-step BVH shadow rays) training regime at tiny
    scale: the full train step must run and move params. (At flagship
    512-res this regime currently faults the device — README regime
    table; this pins the code path itself so the open issue is isolated
    to scale, not logic.)"""
    import jax

    from dreammat_tpu.models.mesh import make_icosphere
    from dreammat_tpu.utils.config import load_config

    import dreammat_tpu

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
            "trainer.max_steps=2",
            "system.renderer.visibility_mode=raytrace",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    dm.data.table_spec = None  # MC estimator with per-step shadow rays
    state = system.fit(dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
                       val_check_interval=0, checkpoint_every=0, log_every=1)
    assert int(state["step"]) == 2
    params0 = system.geometry.init(jax.random.PRNGKey(0))
    diff = float(abs(np.asarray(state["geo"]["table"]) - np.asarray(params0["table"])).sum())
    assert 0.0 < diff < 1e6, diff
