from .profiling import Timer, trace  # noqa: F401
from .visualizer import LiveVisualizer  # noqa: F401
