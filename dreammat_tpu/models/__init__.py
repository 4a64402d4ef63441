"""Built-in model components (import side-effect: registry population)."""

from dreammat_tpu.models import background  # noqa: F401
from dreammat_tpu.models import geometry  # noqa: F401
from dreammat_tpu.models import material  # noqa: F401
from dreammat_tpu.models import renderer  # noqa: F401
from dreammat_tpu.models import mesh  # noqa: F401
from dreammat_tpu.models import prompt  # noqa: F401
from dreammat_tpu.models import guidance  # noqa: F401
from dreammat_tpu.models import guidance_sds  # noqa: F401
from dreammat_tpu.models import geometry_volume  # noqa: F401
from dreammat_tpu.models import material_simple  # noqa: F401
from dreammat_tpu.models import volume_renderer  # noqa: F401
