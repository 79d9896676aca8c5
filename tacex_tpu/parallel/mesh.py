"""Device-mesh / sharding helpers for the env axis.

The framework's scaling axis is ``num_envs`` (SURVEY §2.6): every state and
observation leaf leads with N, each env's physics + tactile pipeline is
local, and the only cross-env communication is RL reductions (psum under
pjit). These helpers place a state pytree on a 1-D ``("env",)`` mesh:
N-leading leaves are sharded, everything else (PRNG keys, curriculum
scalars) is replicated.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def env_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("env",))


def shard_env_tree(tree, mesh: Mesh, num_envs: int):
    """device_put a pytree: leaves with leading dim == num_envs shard over
    ("env",); all other leaves replicate."""
    env_s = NamedSharding(mesh, P("env"))
    rep_s = NamedSharding(mesh, P())

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == num_envs:
            return jax.device_put(leaf, env_s)
        return jax.device_put(leaf, rep_s)

    return jax.tree_util.tree_map(place, tree)
