"""Pytest boot shim: re-exec the test process without the axon TPU plugin.

The session image ships a ``sitecustomize`` that registers the axon PJRT
plugin (remote-TPU tunnel) in every Python process; with that plugin loaded,
even pure-CPU XLA compiles are ~4x slower, which multiplies across a test
suite with hundreds of tiny compiles.  ``sitecustomize`` runs before any
conftest, so the only clean escape is to re-exec with the plugin's trigger
env var removed.

This module is loaded via ``addopts = -p srba_tpu.testboot`` in
``pyproject.toml``.  Plugin modules are imported during pytest's option
preparse — *before* the capture plugin dups stdio fds — so the re-exec'd
process keeps the terminal, unlike a conftest-time exec whose output would
vanish into the capture tempfile.
"""

import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("SRBA_TPU_TEST_REEXEC") != "1"):
    os.environ["SRBA_TPU_TEST_REEXEC"] = "1"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon register()
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])
