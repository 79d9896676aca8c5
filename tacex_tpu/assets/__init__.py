from . import robots, shapes  # noqa: F401
