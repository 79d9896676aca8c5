from .fem import lame_params, stable_neo_hookean_energy  # noqa: F401
from .ipc import IpcSolverCfg, RigidSdfScene, SoftBodyModel, SoftBodyState  # noqa: F401
from .mesh import (  # noqa: F401
    TetMesh,
    box_tet_mesh,
    extract_surface,
    isosurface_stuffing_tet_mesh,
    voxel_tet_mesh,
)
from .msh_io import load_msh  # noqa: F401
