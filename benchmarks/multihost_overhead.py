"""Multi-host broadcast overhead measurement (BASELINE.md DCN-cost
placeholder for the ">= 70% scaling" north star).

Runs the SAME 100-KF config#1 workload two ways on localhost CPU devices:

1. single process, 2-device mesh, SPMD obs-sharded engine (the exact code
   path MultiHostEngine drives, minus the per-keyframe broadcast);
2. a REAL 2-OS-process ``jax.distributed`` gloo ring (2 CPU devices each)
   through ``MultiHostEngine`` — per-keyframe wire-record broadcast + a
   4-device global mesh (tests/multihost_worker.py mode "overhead").

The difference isolates what the coordinator pays per keyframe for the
host-graph sync protocol (one ``broadcast_one_to_all`` + codec) plus
cross-process collective overhead.  On a pod the broadcast rides ICI/DCN
instead of gloo-over-localhost, so this is a conservative upper bound on
protocol cost (localhost gloo has no hardware offload).

Run: python benchmarks/multihost_overhead.py   (needs no TPU)
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile
import time

REPO = str(pathlib.Path(__file__).resolve().parents[1])
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def single_process_kfps() -> float:
    """Same workload on one process (2-device mesh, same SPMD solver)."""
    code = r"""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import numpy as np
from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.models.noise import NoiseIdentity
from srba_tpu.parallel.sharding import make_mesh
from srba_tpu.utils.datasets import make_world_loop_2d, observe
K = 100
world = make_world_loop_2d(num_kfs=K, radius=10.0, num_landmarks=180, seed=11)
ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=6.0,
             odo_noise_std=0.01, seed=11)
eng = SrbaEngine("RangeBearing2D", noise=NoiseIdentity(0.005), mesh=make_mesh(),
                 params=SrbaParams(max_tree_depth=4, max_optimize_depth=4))
t0 = time.perf_counter()
for k, frame in enumerate(ds.frames):
    eng.define_new_keyframe([Observation(lm_id=m, z=z) for m, z in frame],
                            edge_init={k-1: ds.odometry[k-1]} if k else None)
print("KFPS", K / (time.perf_counter() - t0))
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.check_output([sys.executable, "-c", code], env=env,
                                  cwd=REPO, timeout=600).decode()
    for line in out.splitlines():
        if line.startswith("KFPS"):
            return float(line.split()[1])
    raise RuntimeError(f"no KFPS line in: {out[-1000:]}")


def ring_kfps(nprocs: int = 2) -> float:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "overhead")
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             "overhead", out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for pid in range(nprocs)]
        logs = [p.communicate(timeout=900)[0].decode(errors="replace")
                for p in procs]
        for pid, p in enumerate(procs):
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {pid} rc={p.returncode}:\n{logs[pid][-3000:]}")
        with open(f"{out}.0") as f:
            return float(json.load(f)["kf_per_sec"])


def main():
    t0 = time.perf_counter()
    single = single_process_kfps()
    print(f"single-process (2-device mesh):   {single:.1f} KF/s")
    ring = ring_kfps()
    print(f"2-process gloo ring (4 devices):  {ring:.1f} KF/s")
    per_kf_single = 1000.0 / single
    per_kf_ring = 1000.0 / ring
    print(f"per-KF cost: {per_kf_single:.2f} ms -> {per_kf_ring:.2f} ms; "
          f"broadcast+ring overhead {per_kf_ring - per_kf_single:.2f} ms/KF "
          f"({(per_kf_ring - per_kf_single) / per_kf_ring * 100:.0f}% of the "
          f"multi-process per-KF budget)")
    print(f"total {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
