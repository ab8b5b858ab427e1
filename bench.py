"""Benchmark: keyframes/sec on BASELINE config #1 (2D range-bearing SE(2)
SLAM, ~100-keyframe synthetic loop) — the primary metric of BASELINE.json.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "keyframes/sec", "vs_baseline": N}

Baseline note: the reference repo publishes no numbers and the reference
mount has been empty (BASELINE.md); the ICRA'13 SRBA paper reports per-KF
cost of "milliseconds to tens of ms" on 2012-era x86 for comparable synthetic
range-bearing worlds at these tree depths.  ``vs_baseline`` therefore uses
the midpoint of that claim (10 ms/KF => 100 KF/s) as the stand-in reference
throughput until the reference binary can be built and measured.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_KF_PER_SEC = 100.0  # stand-in; see module docstring / BASELINE.md
NUM_KFS = 100


def run_once(ds, report_profile=False):
    from srba_tpu import Observation, SrbaEngine, SrbaParams

    eng = SrbaEngine(
        "RangeBearing2D",
        params=SrbaParams(max_tree_depth=4, max_optimize_depth=4))
    t0 = time.perf_counter()
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        edge_init = {k - 1: ds.odometry[k - 1]} if k > 0 else None
        eng.define_new_keyframe(obs, edge_init=edge_init)
    # Final fence: the device-master path is fully async (nothing downloaded
    # per keyframe), so drain the device queue before stopping the clock.
    eng.sync()
    dt = time.perf_counter() - t0
    if report_profile:
        print(eng.profiler.report(), file=sys.stderr)
    return eng, dt


def main():
    from srba_tpu.utils.datasets import (ate_rmse, make_world_loop_2d,
                                         observe)

    world = make_world_loop_2d(num_kfs=NUM_KFS, radius=10.0,
                               num_landmarks=180, seed=11)
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=6.0,
                 odo_noise_std=0.01, seed=11)

    # Warmup pass: triggers all window-bucket jit compilations.
    _, warm_dt = run_once(ds)
    print(f"warmup pass: {warm_dt:.2f}s", file=sys.stderr)

    # Measured pass: steady-state (compile cache hot).
    eng, dt = run_once(ds, report_profile=True)
    kf_per_sec = NUM_KFS / dt

    G, _ = eng.create_complete_spanning_tree(0)
    ate = ate_rmse(np.asarray(G)[:, :2], world.gt_poses[:, :2])
    err = eng.eval_overall_squared_error()
    print(f"steady pass: {dt:.3f}s  ({kf_per_sec:.1f} KF/s)  "
          f"ATE={ate:.4f}  overall_err={err:.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": "keyframes/sec (LM+Schur, config#1 2D range-bearing "
                  f"{NUM_KFS}-KF loop, ATE={ate:.4f})",
        "value": round(kf_per_sec, 2),
        "unit": "keyframes/sec",
        "vs_baseline": round(kf_per_sec / REF_KF_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
