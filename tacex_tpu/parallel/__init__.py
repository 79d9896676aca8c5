from .mesh import env_mesh, shard_env_tree  # noqa: F401
