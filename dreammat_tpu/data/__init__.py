"""Data layer (import side-effect: registry population)."""

from dreammat_tpu.data import datamodule  # noqa: F401
