"""Native (C++) host graph service — build + ctypes binding.

The shared library is compiled from ``graph_core.cpp`` on first use (g++,
-O3) and cached next to the source keyed by a content hash; if no toolchain
is available the callers fall back to the pure-Python implementations
(``srba_tpu.graph.spantree`` / ``srba_tpu.solver.window``) behind the same
interface.  pybind11 is not in the image, so the binding is a plain C ABI
consumed via ctypes (zero-copy numpy buffer pointers).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "graph_core.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "SRBA_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "srba_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"libsrba_graph_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            try:  # retry without -march=native (portability)
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (OSError, subprocess.SubprocessError):
                return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    ip = ctypes.POINTER(ctypes.c_int32)
    lib.srba_core_new.restype = ctypes.c_void_p
    lib.srba_core_new.argtypes = [ctypes.c_int]
    lib.srba_core_free.argtypes = [ctypes.c_void_p]
    lib.srba_core_add_kf.argtypes = [ctypes.c_void_p]
    lib.srba_core_add_edge.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int]
    lib.srba_core_add_lm.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_int]
    lib.srba_core_add_obs.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int]
    lib.srba_core_num_edges.argtypes = [ctypes.c_void_p]
    lib.srba_core_bfs_tree.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ip, ip, ip, ip]
    lib.srba_core_path.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ip, ip]
    lib.srba_core_build_window.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ip, ip, ip, ip, ip, ip, ip, ip, ip, ip]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable (no toolchain).
    Disable explicitly with SRBA_TPU_NO_NATIVE=1."""
    global _LIB, _TRIED
    if os.environ.get("SRBA_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            _LIB = _build_and_load()
    return _LIB
