from srba_tpu.ops.lie import SE2, SE3  # noqa: F401
