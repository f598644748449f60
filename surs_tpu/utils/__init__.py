from .profiling import timed, Profiler, annotate

__all__ = ["timed", "Profiler", "annotate"]
