from gsvc_tpu.ops.projection import (  # noqa: F401
    project_gaussians_2d,
    project_gaussians_2d_scale_rot,
)
from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum  # noqa: F401
