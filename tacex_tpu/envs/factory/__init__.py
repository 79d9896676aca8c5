"""Factory task registrations (reference factory/__init__.py:17-47)."""

from ..base import register
from .env import FactoryEnv, FactoryEnvCfg, gear_mesh_task, nut_thread_task, peg_insert_task

register(
    "TacEx-Factory-PegInsert-Direct-v0",
    FactoryEnv,
    lambda: FactoryEnvCfg(task=peg_insert_task()),
)
register(
    "TacEx-Factory-GearMesh-Direct-v0",
    FactoryEnv,
    lambda: FactoryEnvCfg(task=gear_mesh_task()),
)
register(
    "TacEx-Factory-NutThread-Direct-v0",
    FactoryEnv,
    lambda: FactoryEnvCfg(task=nut_thread_task()),
)

# Peg-insert on the unified FEM+ABD contact world: the gripper gel pads
# are FEM bodies in the coupled solve, the peg a free affine body carried
# by gel friction (the reference's uipc-gripper asset exists but its
# Factory envs only ever mount rigid pads, factory_env_cfg.py:192-213).
from .env_uipc import FactoryUipcEnv, FactoryUipcEnvCfg  # noqa: E402

register(
    "TacEx-Factory-PegInsert-Uipc-v0",
    FactoryUipcEnv,
    lambda: FactoryUipcEnvCfg(),
)
register(
    "TacEx-Factory-PegInsert-Uipc-Depth-v0",
    FactoryUipcEnv,
    lambda: FactoryUipcEnvCfg(obs_mode="depth"),
)
