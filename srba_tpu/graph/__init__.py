from srba_tpu.graph.spantree import KeyframeGraph  # noqa: F401
