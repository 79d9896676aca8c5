"""GelSightSensorData: typed view over a sensor frame.

API-parity counterpart of the reference's data container (reference
source/tacex/tacex/gelsight_sensor_data.py:7-23: pose, intrinsics,
``output`` dict). In the functional pipeline the outputs are produced per
step; this dataclass packages them with the sensor pose for consumers that
expect the reference surface.
"""

from __future__ import annotations

import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GelSightSensorData:
    pos_w: jax.Array | None = None  # (N, 3) sensor (camera) world position
    quat_w: jax.Array | None = None  # (N, 4)
    intrinsic_matrices: jax.Array | None = None  # (N, 3, 3)
    output: dict = dataclasses.field(default_factory=dict)
    """Output buffers; keys follow the reference contract
    (gelsight_sensor_cfg.py:39-50): height_map (N,h,w) mm, camera_depth
    (N,h,w,1) m, tactile_rgb (N,H,W,3) [0,1], marker_motion (N,2,M,2),
    indentation_depth (N,) mm."""
