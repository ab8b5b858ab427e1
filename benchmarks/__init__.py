"""Benchmark harnesses (importable so multi-process workers can reuse the
workload builders, e.g. ``benchmarks.scaling_curve.make_workload``)."""
