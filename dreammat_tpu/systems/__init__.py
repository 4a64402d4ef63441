"""Systems (import side-effect: registry population)."""

from dreammat_tpu.systems import dreammat  # noqa: F401
from dreammat_tpu.systems import controlnet_trainer  # noqa: F401
from dreammat_tpu.systems import texcraft  # noqa: F401
from dreammat_tpu.systems import dreamfusion  # noqa: F401
from dreammat_tpu.systems import latentnerf  # noqa: F401
from dreammat_tpu.systems import prolificdreamer  # noqa: F401
from dreammat_tpu.systems import textmesh  # noqa: F401
from dreammat_tpu.systems import magic3d  # noqa: F401
from dreammat_tpu.systems import sjc  # noqa: F401
from dreammat_tpu.systems import zero123  # noqa: F401
from dreammat_tpu.systems import magic123  # noqa: F401
from dreammat_tpu.systems import instructnerf2nerf  # noqa: F401
from dreammat_tpu.systems import fantasia3d  # noqa: F401
from dreammat_tpu.systems import control4d  # noqa: F401
