"""launch.py CLI drives the volume/DMTet system families end-to-end
(train -> test renders -> export), same surface as the dreammat path."""

import os
import pytest


def _run_launch(argv):
    import launch

    launch.main(argv)


@pytest.mark.parametrize("config,extra", [
    ("configs/dreamfusion_tiny.yaml",
     ["system.prompt_processor.prompt=a red apple"]),
    ("configs/fantasia3d_tiny.yaml",
     ["system.prompt_processor.prompt=a stone hamburger"]),
])
def test_launch_train_volume(tmp_path, config, extra):
    root = os.path.join(os.path.dirname(__file__), "..")
    argv = [
        "--config", os.path.join(root, config), "--train",
        f"exp_root_dir={tmp_path}/outputs",
        "trainer.max_steps=2",
        "data.n_test_views=2",
    ] + extra
    _run_launch(argv)
    # one trial dir with test renders + export
    base = os.path.join(str(tmp_path), "outputs")
    trials = [os.path.join(dp) for dp, dn, fn in os.walk(base)
              if "it2-test.gif" in fn]
    assert trials, f"no test gif under {base}"
    exports = [os.path.join(dp, f) for dp, dn, fn in os.walk(base)
               for f in fn if f.endswith(".obj")]
    assert exports, f"no export under {base}"
