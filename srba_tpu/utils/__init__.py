from srba_tpu.utils.profiler import Profiler  # noqa: F401
