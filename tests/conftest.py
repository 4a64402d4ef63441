"""Test config: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: this image exports JAX_PLATFORMS=axon (TPU plugin) globally and the
env var is re-prepended, so the override must go through jax.config before
the backend initializes."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def assert_state_moved(state, system_cls, cfg, datamodule, keys, seed=0,
                       trial_dir=None, prep_state0=None):
    """Assert training actually moved the listed state subtrees away from
    their seed-identical init (a no-op optimizer, a zero guidance gradient,
    or a dead stop_gradient would leave them exactly at init — finiteness
    checks alone cannot catch that). Reconstructs the init state via a
    fresh system's fit(max_steps=0), which performs the same seeded init
    and runs zero steps. `prep_state0(sys0, state0) -> state0` lets tests
    materialize lazily-created subtrees (e.g. control4d's GAN params)."""
    import numpy as np

    sys0 = system_cls(cfg.system)
    state0 = sys0.fit(
        datamodule, max_steps=0, seed=seed,
        trial_dir=trial_dir or cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    if prep_state0 is not None:
        state0 = prep_state0(sys0, state0)
    for key in keys:
        import jax as _jax

        la = _jax.tree_util.tree_leaves(state[key])
        lb = _jax.tree_util.tree_leaves(state0[key])
        assert len(la) == len(lb), key
        moved = sum(
            float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).sum())
            for a, b in zip(la, lb)
            if np.asarray(a).dtype.kind == "f"
        )
        assert moved > 0.0, f"state[{key!r}] did not move from init"
