from .profiler import T, global_timer, timer_summary  # noqa: F401
