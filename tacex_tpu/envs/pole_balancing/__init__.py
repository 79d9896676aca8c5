"""Pole balancing registration (reference pole_balancing/__init__.py:20-30)."""

from ..base import register
from .env import PoleBalancingEnv, PoleBalancingEnvCfg

register("TacEx-Pole-Balancing-Base-v0", PoleBalancingEnv, lambda: PoleBalancingEnvCfg())
