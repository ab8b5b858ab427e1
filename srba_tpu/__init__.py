"""srba_tpu — a TPU-native Sparser Relative Bundle Adjustment framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++
reference library MRPT/srba (see SURVEY.md for the blueprint): incremental
SLAM in relative coordinates over a keyframe graph with bounded-depth
spanning trees, pluggable landmark/observation models, edge-creation policies
with loop closures, and local Levenberg-Marquardt with Schur-complement
landmark marginalization — redesigned for TPU hardware rather than ported.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: window-shape buckets recompile identical
# programs across processes otherwise (10-40 s each on a tunneled TPU).
# TPU-only: CPU AOT cache entries are machine-feature-sensitive (SIGILL risk
# when the cache dir moves across hosts).  Opt out with
# SRBA_TPU_NO_COMPILE_CACHE=1.
if (not _os.environ.get("SRBA_TPU_NO_COMPILE_CACHE")
        and _os.environ.get("PALLAS_AXON_POOL_IPS")
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/srba_tpu_xla"))
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from srba_tpu.engine.engine import (  # noqa: F401
    Observation,
    SrbaEngine,
    SrbaParams,
    TNewKeyFrameInfo,
)
from srba_tpu.ops.lie import SE2, SE3  # noqa: F401
