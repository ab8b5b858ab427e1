"""Multi-chip / multi-host scaling-curve harness (VERDICT r4 next #1; the
">= 70% linear keyframes/s scaling" north star of BASELINE.json).

Measures keyframes/sec of the SAME SPMD engine path across:

1. **single-process CPU meshes of {1, 2, 4, 8} devices** — pure
   mesh-width scaling of the obs-sharded LM + distributed Schur psum,
   no cross-process protocol;
2. **a real 2-OS-process ``jax.distributed`` gloo ring** (2 CPU devices
   per process, 4-device global mesh) through ``MultiHostEngine`` —
   adds the per-keyframe host-graph broadcast protocol, at broadcast
   batch sizes {1, 8} (``MultiHostEngine.broadcast_batch``);

at TWO workload scales:

* ``rb2d``   — BASELINE config #1 (small windows; protocol/dispatch-bound:
  the adversarial regime for multi-host);
* ``stereo`` — a BASELINE-config-#3-shaped stereo SE(3) workload with
  local-areas closures (the large-window regime multi-host exists for).

Every point warms compiles with one full pass, then times a second pass on
a fresh engine (jit caches persist in-process).  Results go to stdout as a
table and to ``benchmarks/scaling_results.json``; BASELINE.md records the
curve.

Run: python benchmarks/scaling_curve.py [--quick]   (needs no TPU)
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


# ---------------------------------------------------------------------------
# Workloads (shared with tests/multihost_worker.py mode "overhead")
# ---------------------------------------------------------------------------

def make_workload(name: str, K: int):
    """-> (world, dataset, MultiHostEngine/SrbaEngine kwargs, gt_dims)."""
    from srba_tpu import SrbaParams
    from srba_tpu.models.noise import NoiseIdentity
    from srba_tpu.utils.datasets import (make_world_loop_2d,
                                         make_world_loop_3d, observe)
    if name == "rb2d":
        world = make_world_loop_2d(num_kfs=K, radius=10.0, num_landmarks=180,
                                   seed=11)
        ds = observe(world, "RangeBearing2D", noise_std=0.005,
                     sensor_range=6.0, odo_noise_std=0.01, seed=11)
        kw = dict(obs_model="RangeBearing2D", noise=NoiseIdentity(0.005),
                  params=SrbaParams(max_tree_depth=4, max_optimize_depth=4))
        return world, ds, kw, 2
    if name == "stereo":
        from srba_tpu.ecps import LocalAreasFixedGrid
        from srba_tpu.models.observations import StereoCalib
        from srba_tpu.models.sensor_pose import SensorPoseSE3
        from srba_tpu.ops.np_lie import CAMERA_SENSOR_POSE_SE3
        world = make_world_loop_3d(num_kfs=K, radius=8.0, num_landmarks=400,
                                   height_amp=0.5, seed=1)
        calib = StereoCalib.make(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                                 baseline=0.12)
        ds = observe(world, "StereoCamera", calib=calib, noise_std=0.3,
                     sensor_range=9.0, odo_noise_std=0.01, seed=1)
        kw = dict(obs_model="StereoCamera", calib=calib,
                  noise=NoiseIdentity(0.3),
                  sensor_pose=SensorPoseSE3(CAMERA_SENSOR_POSE_SE3),
                  ecp=LocalAreasFixedGrid(submap_size=10,
                                          min_obs_count_loop_closure=5),
                  params=SrbaParams(max_tree_depth=4, max_optimize_depth=3,
                                    extra_obs_per_lm_cap=6,
                                    incremental_max_iters=3))
        return world, ds, kw, 3
    raise ValueError(f"unknown workload {name!r}")


def drive_workload(eng, ds) -> None:
    """Feed every frame (works for SrbaEngine and MultiHostEngine)."""
    from srba_tpu import Observation
    for k, frame in enumerate(ds.frames):
        eng.define_new_keyframe(
            [Observation(lm_id=m, z=z) for m, z in frame],
            edge_init={k - 1: ds.odometry[k - 1]} if k else None)


# ---------------------------------------------------------------------------
# Measurement runners
# ---------------------------------------------------------------------------

def single_process_point(workload: str, K: int, n_devices: int) -> dict:
    """KF/s of the SPMD engine over an ``n_devices`` single-process CPU
    mesh (fresh subprocess: the device count must be fixed before jax
    loads).  Pass 1 warms compiles; the MEDIAN of 3 timed passes on fresh
    engines is reported (short rb2d passes showed ~2x run-to-run noise on
    the 2-core session host with a single timed pass)."""
    code = f"""
import os, time, statistics
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={n_devices}"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import numpy as np
from benchmarks.scaling_curve import drive_workload, make_workload
from srba_tpu import SrbaEngine
from srba_tpu.parallel.sharding import make_mesh
from srba_tpu.utils.datasets import ate_rmse
world, ds, kw, d = make_workload({workload!r}, {K})
obs_model = kw.pop("obs_model")

def fresh():
    import copy
    kw2 = dict(kw)
    if "ecp" in kw2:
        kw2["ecp"] = copy.deepcopy(kw2["ecp"])
    return SrbaEngine(obs_model, mesh=make_mesh(), **kw2)

drive_workload(fresh(), ds)          # warm pass (compiles)
dts = []
for _ in range(3):
    eng = fresh()
    t0 = time.perf_counter()
    drive_workload(eng, ds)
    dts.append(time.perf_counter() - t0)
dt = statistics.median(dts)
G, _ = eng.create_complete_spanning_tree(0)
n = min(len(G), len(world.gt_poses))
ate = float(ate_rmse(G[:n, :d], world.gt_poses[:n, :d]))
print("RESULT", {K} / dt, ate)
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.check_output([sys.executable, "-c", code], env=env,
                                  cwd=REPO, timeout=3600).decode()
    for line in out.splitlines():
        if line.startswith("RESULT"):
            _, kfps, ate = line.split()
            return {"kind": "single", "workload": workload, "K": K,
                    "devices": n_devices, "kf_per_sec": float(kfps),
                    "ate": float(ate)}
    raise RuntimeError(f"no RESULT line in: {out[-1000:]}")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def ring_point(workload: str, K: int, batch: int, nprocs: int = 2,
               devs_per_proc: int = 2) -> dict:
    """KF/s of the 2-OS-process gloo ring (MultiHostEngine protocol)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["SRBA_MH_WORKLOAD"] = workload
    env["SRBA_MH_K"] = str(K)
    env["SRBA_MH_BATCH"] = str(batch)
    env["SRBA_MH_DEVS"] = str(devs_per_proc)
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "ring")
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nprocs), str(port),
             "overhead", out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for pid in range(nprocs)]
        logs = [p.communicate(timeout=3600)[0].decode(errors="replace")
                for p in procs]
        for pid, p in enumerate(procs):
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {pid} rc={p.returncode}:\n{logs[pid][-3000:]}")
        with open(f"{out}.0") as f:
            r = json.load(f)
    return {"kind": "ring", "workload": workload, "K": K,
            "processes": nprocs, "devices": nprocs * devs_per_proc,
            "batch": batch, "kf_per_sec": float(r["kf_per_sec"]),
            "ate": float(r["ate"])}


# ---------------------------------------------------------------------------
# The curve
# ---------------------------------------------------------------------------

def main(quick: bool = False) -> None:
    t_start = time.perf_counter()
    K_rb, K_st = (50, 60) if quick else (200, 120)
    results = []

    def rec(r):
        results.append(r)
        tag = (f"{r['devices']}-dev single" if r["kind"] == "single" else
               f"{r['processes']}-proc ring (batch {r['batch']})")
        print(f"{r['workload']:>7}  {tag:<26} {r['kf_per_sec']:8.2f} KF/s  "
              f"ATE {r['ate']:.4f}", flush=True)

    for wl, K in (("rb2d", K_rb), ("stereo", K_st)):
        for n in (1, 2, 4, 8):
            rec(single_process_point(wl, K, n))
        for batch in (1, 8):
            rec(ring_point(wl, K, batch))

    # Efficiency summary: ring vs the single-process run on the same
    # device count (4), and mesh-width scaling vs 1 device.
    print("\n--- scaling summary ---")
    by = {(r["kind"], r["workload"], r.get("devices"), r.get("batch")): r
          for r in results}
    for wl in ("rb2d", "stereo"):
        base1 = by[("single", wl, 1, None)]["kf_per_sec"]
        for n in (2, 4, 8):
            s = by[("single", wl, n, None)]["kf_per_sec"]
            print(f"{wl}: {n}-dev mesh {s / base1 * 100:5.1f}% of 1-dev "
                  f"throughput ({s:.2f} vs {base1:.2f} KF/s)")
        s4 = by[("single", wl, 4, None)]["kf_per_sec"]
        for batch in (1, 8):
            rg = by[("ring", wl, 4, batch)]["kf_per_sec"]
            print(f"{wl}: 2-proc ring (batch {batch}) reaches "
                  f"{rg / s4 * 100:5.1f}% of the same-width single-process "
                  f"mesh ({rg:.2f} vs {s4:.2f} KF/s)")

    out_path = os.path.join(REPO, "benchmarks", "scaling_results.json")
    with open(out_path, "w") as f:
        json.dump({"results": results,
                   "wall_s": round(time.perf_counter() - t_start, 1)}, f,
                  indent=1)
    print(f"\nwrote {out_path}  ({time.perf_counter() - t_start:.0f}s total)")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv[1:])
