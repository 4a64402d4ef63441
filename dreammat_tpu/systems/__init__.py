"""Systems (import side-effect: registry population)."""

from dreammat_tpu.systems import dreammat  # noqa: F401
from dreammat_tpu.systems import controlnet_trainer  # noqa: F401
from dreammat_tpu.systems import texcraft  # noqa: F401
from dreammat_tpu.systems import dreamfusion  # noqa: F401
from dreammat_tpu.systems import latentnerf  # noqa: F401
