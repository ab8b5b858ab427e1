"""Test configuration: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §5,
"multi-host tests runnable without a pod").  Must set env vars before the
first ``import jax`` anywhere in the test process.
"""

import os

# Re-exec away from the axon TPU plugin happens earlier, in
# srba_tpu/testboot.py (loaded via pyproject addopts before pytest's fd
# capture starts).  Here we only force the env in case pytest was invoked in
# a way that skipped the plugin (e.g. explicit -p no:... or a bare python
# runner importing test modules).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
