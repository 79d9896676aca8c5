from . import taxim  # noqa: F401
