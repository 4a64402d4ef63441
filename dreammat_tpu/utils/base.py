"""Component base classes.

TPU-native rethink of the reference's ``BaseObject``/``BaseModule``
(/root/reference/threestudio_dreammat/threestudio/utils/base.py:11-118):
components are *pure-function holders* — a configured object whose learnable
state (if any) is an explicit pytree produced by ``init(rng)`` and consumed
by ``apply(params, ...)`` — never a stateful nn.Module. Per-step scheduled
scalars are evaluated inside the jitted step via
:func:`dreammat_tpu.utils.schedule.C_jax`, so there is no python-side
``Updateable`` mutation chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from dreammat_tpu.utils.config import parse_structured


class BaseObject:
    """A configurable component. Subclasses define an inner ``Config``
    dataclass and a ``configure(*args)`` hook."""

    @dataclass
    class Config:
        pass

    cfg: Any

    def __init__(self, cfg: Optional[dict] = None, *args, **kwargs) -> None:
        if isinstance(cfg, self.Config):
            self.cfg = cfg
        else:
            self.cfg = parse_structured(self.Config, cfg)
        self.configure(*args, **kwargs)

    def configure(self, *args, **kwargs) -> None:
        pass
