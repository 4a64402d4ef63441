"""dreammat_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DreamMat.

Text+geometry -> PBR material generation by score distillation from a
geometry- and light-aware ControlNet-conditioned Stable Diffusion model,
with a fully XLA-resident physically-based Monte-Carlo renderer.

Component registry semantics follow the reference framework
(/root/reference/threestudio_dreammat/threestudio/__init__.py:1-13):
components self-register under a string name and are constructed via
``find(name)(cfg, ...)``.
"""

__version__ = "0.1.0"

__modules__: dict = {}


def register(name: str):
    """Class decorator: register a component under ``name``."""

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"component '{name}' already registered")
        __modules__[name] = cls
        cls.registry_name = name
        return cls

    return decorator


def find(name: str):
    """Look up a registered component class by name (importing built-ins lazily)."""
    if name not in __modules__:
        # lazy import of built-in component packages so `find` works without
        # the user importing every submodule explicitly
        from dreammat_tpu import models, systems, data  # noqa: F401
    if name not in __modules__:
        raise KeyError(
            f"unknown component '{name}'; known: {sorted(__modules__.keys())}"
        )
    return __modules__[name]


# ---------------------------------------------------------------------------
# lightweight colored logging (reference: launch.py:8-39)
# ---------------------------------------------------------------------------
import logging as _logging

logger = _logging.getLogger("dreammat_tpu")
if not logger.handlers:
    _h = _logging.StreamHandler()
    _h.setFormatter(_logging.Formatter("[dreammat-tpu] %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(_logging.INFO)


def info(msg, *a):
    logger.info(msg, *a)


def warn(msg, *a):
    logger.warning(msg, *a)


def debug(msg, *a):
    logger.debug(msg, *a)


# ---------------------------------------------------------------------------
# persistent XLA compilation cache: prerender/train-step compiles are tens of
# seconds each; repeat runs (and every job after the first in batch
# generation) should pay zero. Disable with DREAMMAT_NO_COMPILE_CACHE=1.
# ---------------------------------------------------------------------------
import os as _os

# backend override: the TPU image force-registers its PJRT plugin and pins
# JAX_PLATFORMS at interpreter start, so the env var alone cannot select
# cpu. DREAMMAT_PLATFORM=cpu routes through jax.config before backend init
# (works for every entry point + subprocess that imports this package).
if _os.environ.get("DREAMMAT_PLATFORM"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["DREAMMAT_PLATFORM"])
    except Exception:
        pass

if _os.environ.get("DREAMMAT_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "DREAMMAT_COMPILE_CACHE",
                _os.path.expanduser("~/.cache/dreammat_tpu_xla"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # old jax or read-only fs: run without the cache
        pass
