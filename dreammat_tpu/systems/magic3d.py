"""Magic3D system (coarse stage).

TPU-native rebuild of the reference
(/root/reference/threestudio_dreammat/threestudio/systems/magic3d.py:
13-164): the coarse stage is exactly the DreamFusion loss set (SDS +
orient/sparsity/opaque, :53-75) over a NeRF volume with the
diffuse-point-light material's soft-shading augmentation and the magic3d
light-sampling strategy; only the defaults differ. The ``refinement``
stage (:76-81 — DMTet mesh extracted from coarse, optimized through a
rasterizer with a normal-consistency loss) depends on differentiable mesh
geometry, which this framework's frozen-geometry raytracer deliberately
does not provide (SURVEY §7: geometry is fixed on every supported path);
``refinement=True`` raises rather than pretending.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import dreammat_tpu
from dreammat_tpu.systems.dreamfusion import DreamFusion


@dreammat_tpu.register("magic3d-system")
class Magic3D(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        refinement: bool = False
        material: dict = field(default_factory=lambda: {
            "ambient_only_steps": 2001, "soft_shading": True,
        })
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 1.0,
            "lambda_orient": [0, 10.0, 1000.0, 5000],
            "lambda_sparsity": 1.0,
            "lambda_opaque": 0.0,
        })

    cfg: Config

    def configure(self) -> None:
        if self.cfg.refinement:
            raise NotImplementedError(
                "magic3d refinement needs differentiable mesh geometry "
                "(DMTet + rasterizer); see module docstring"
            )
        super().configure()
