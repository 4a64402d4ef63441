"""Step-scheduled scalar hyperparameters.

Mirrors the reference ``C()`` interpolator
(/root/reference/threestudio_dreammat/threestudio/utils/misc.py:65-86):
a scalar config value may be a plain number, or a list
``[start_step, start_value, end_value, end_step]`` (3-element lists get
``start_step=0`` prepended), linearly interpolated and clamped.

Two implementations are provided:

- :func:`C` — python-side, for host orchestration code.
- :func:`C_jax` — traced, for use *inside* a jitted step function so the
  whole annealing schedule lives on-device (no python-side mutation, unlike
  the reference's per-step ``Updateable`` hook chain).
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp


def _canon(value) -> list:
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    if len(value) != 4:
        raise ValueError(f"scheduled scalar must have 3 or 4 entries, got {value}")
    return value


def C(value: Any, epoch: int, global_step: int) -> float:
    """Evaluate a (possibly scheduled) scalar at a python step count."""
    if isinstance(value, (int, float)):
        return value
    start_step, start_value, end_value, end_step = _canon(value)
    # float end_step means epoch-indexed schedule (reference misc.py:81)
    t = epoch if isinstance(end_step, float) else global_step
    frac = (t - start_step) / (end_step - start_step)
    frac = max(min(1.0, frac), 0.0)
    return start_value + (end_value - start_value) * frac


def C_jax(value: Any, global_step) -> "jnp.ndarray":
    """Traced version of :func:`C` on a step *array*; epoch schedules are not
    supported on-device (DreamMat's config only uses step schedules)."""
    if isinstance(value, (int, float)):
        return jnp.asarray(value, dtype=jnp.float32)
    start_step, start_value, end_value, end_step = _canon(value)
    step = jnp.asarray(global_step, dtype=jnp.float32)
    frac = (step - start_step) / float(end_step - start_step)
    frac = jnp.clip(frac, 0.0, 1.0)
    return jnp.asarray(start_value + (end_value - start_value) * frac, dtype=jnp.float32)
