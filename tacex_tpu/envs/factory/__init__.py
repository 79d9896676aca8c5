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
