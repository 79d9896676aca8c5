from .depth_camera import SdfScene, render_depth, render_depth_batch  # noqa: F401
from .mesh_raster import (  # noqa: F401
    raster_depth,
    transform_tris,
    triangle_affine_coeffs,
    world_tris_to_cam,
)
