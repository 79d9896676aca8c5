from . import bodies, contact, franka  # noqa: F401
