"""Data layer (import side-effect: registry population)."""

from dreammat_tpu.data import datamodule  # noqa: F401
from dreammat_tpu.data import image  # noqa: F401
from dreammat_tpu.data import multiview  # noqa: F401
from dreammat_tpu.data import co3d  # noqa: F401
