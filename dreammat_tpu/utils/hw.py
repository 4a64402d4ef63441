"""Hardware/backend probes shared by the Pallas-vs-XLA dispatch sites.

The TPU image used for benching reaches the chip through a remote PJRT
plugin that registers its platform under a DIFFERENT name ("axon"), so the
conventional ``jax.default_backend() == "tpu"`` check is FALSE on the real
chip — gating Pallas kernels on it silently routes every hot path (flash
attention, dense ray caster, rasterizer hit pass) to the XLA fallbacks.
Probe the device itself instead: the device_kind string names the actual
hardware regardless of how the plugin registered its platform.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def is_tpu_backend() -> bool:
    """True when the default JAX backend drives a TPU, under any PJRT
    platform name (native "tpu", or tunneled plugins like "axon")."""
    import jax

    try:
        if jax.default_backend() == "tpu":
            return True
        dev = jax.devices()[0]
        kind = str(getattr(dev, "device_kind", "")).lower()
        plat = str(getattr(dev, "platform", "")).lower()
        return "tpu" in kind or plat in ("tpu", "axon")
    except Exception:
        return False
