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


# bf16 peak TFLOP/s per chip by device_kind substring (public spec sheets).
# Order matters: first match wins.
_PEAK_TFLOPS_BY_KIND = (
    ("v5 lite", 197.0),   # v5e
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6 lite", 918.0),   # Trillium / v6e
    ("v6e", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def peak_bf16_tflops(default: float = 197.0) -> float:
    """bf16 peak TFLOP/s of the attached chip, derived from device_kind.

    Falls back to ``default`` (v5e) for unknown kinds so MFU math stays
    defined; callers that care should log which branch was taken."""
    import jax

    try:
        kind = str(getattr(jax.devices()[0], "device_kind", "")).lower()
    except Exception:
        return default
    for sub, peak in _PEAK_TFLOPS_BY_KIND:
        if sub in kind:
            return peak
    return default


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
