"""Roofline measurement of the three hot device programs (BASELINE.md north
star: "per-chip BA kernels at speed-of-light FLOP/byte utilization,
roofline-documented").

For each program: XLA's own cost model (``compiled.cost_analysis()``:
flops + bytes accessed) + measured wall time on the real chip gives
achieved FLOP/s, achieved bytes/s, arithmetic intensity, and the roofline
bound (compute-bound vs HBM-bound) against the chip peaks.  Results are
recorded in BASELINE.md.

Programs measured:
1. window LM+Schur solve at the per-keyframe bucket shapes the bench
   configs actually run (small — dispatch/latency dominated by design);
2. the same program at a LARGE window (MXU-bound regime);
3. batched SPD inverse (ops/block_linalg.py) at PGO scale;
4. global PGO (LM+PCG) end-to-end at 20k SE(3) nodes.

Run: python benchmarks/roofline.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# TPU v5e (v5 lite) single-chip peaks.
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 49e12        # MXU f32 ~= bf16/4 on v5e
PEAK_HBM_BPS = 819e9


def _fmt(x, unit=""):
    for s, f in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(x) >= f:
            return f"{x/f:.2f} {s}{unit}"
    return f"{x:.2f} {unit}"


def measure(name, jitted, args, reps=5, fetch=None):
    """Compile, cost-analyze, and time one program.  ``fetch`` extracts a
    small leaf from the output to device_get as the completion fence
    (block_until_ready under-waits on the tunneled backend for some
    programs; a value fetch is unambiguous)."""
    import jax
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops = bytes_ = 0.0
    out = compiled(*args)
    fence = fetch if fetch is not None else (lambda o: jax.tree.leaves(o)[0])
    jax.device_get(fence(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.device_get(fence(out))
        ts.append(time.perf_counter() - t0)
    # Median, minus nothing: includes one ~25 ms fetch RTT — report both.
    dt = float(np.median(ts))
    ai = flops / bytes_ if bytes_ else float("nan")
    achieved_f = flops / dt if dt else 0.0
    achieved_b = bytes_ / dt if dt else 0.0
    bound = "compute" if ai > PEAK_FLOPS_F32 / PEAK_HBM_BPS else "HBM"
    print(f"{name}")
    print(f"  flops={_fmt(flops, 'F')}  bytes={_fmt(bytes_, 'B')}  "
          f"AI={ai:.1f} F/B ({bound}-bound at f32 peak)")
    print(f"  time={dt*1e3:.2f} ms (median of {reps}, incl. one fetch RTT)")
    print(f"  achieved {_fmt(achieved_f, 'FLOP/s')} "
          f"({achieved_f/PEAK_FLOPS_F32*100:.1f}% of f32 peak, "
          f"{achieved_f/PEAK_FLOPS_BF16*100:.1f}% of bf16 peak); "
          f"{_fmt(achieved_b, 'B/s')} "
          f"({achieved_b/PEAK_HBM_BPS*100:.1f}% of HBM peak)")
    return {"name": name, "flops": flops, "bytes": bytes_, "ms": dt * 1e3,
            "achieved_flops": achieved_f, "achieved_bps": achieved_b}


def window_solver(E, L, N, iters=6, neq="auto"):
    import jax
    from benchmarks.solver_engines import make_batch
    from srba_tpu.solver.lm import SolverConfig, make_solver_impl
    batch = make_batch(E, L, N)
    cfg = SolverConfig(obs_model="RangeBearing3D", pose_group="SE3",
                       lm_type="Euclidean3D", max_depth=4,
                       solver="schur_dense_cholesky", max_iters=iters,
                       rel_tol=0.0, neq=neq)
    solve, _ = make_solver_impl(cfg)
    return jax.jit(solve), (batch,), (lambda o: o[2]["err_final"])


def spd_inverse_prog(B=20480, d=6):
    import jax
    import jax.numpy as jnp
    from srba_tpu.ops.block_linalg import spd_inverse
    rng = np.random.default_rng(0)
    A = rng.normal(0, 1, (B, d, d)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) + 3 * np.eye(d, dtype=np.float32)
    return (jax.jit(spd_inverse), (jnp.asarray(H),),
            (lambda o: o[0, 0, 0]))


def pgo_20k():
    """End-to-end PGO wall time (jitted inner loop measured via info fetch)."""
    from srba_tpu.ops.np_lie import NpSE3
    from srba_tpu.solver.global_graphslam import (PGOConfig,
                                                  optimize_global_pose_graph)
    rng = np.random.default_rng(0)
    K = 20000
    th = 2 * np.pi * np.arange(K) / K
    gt = np.stack([NpSE3.pexp(np.asarray(
        [30 * np.cos(t), 30 * np.sin(t), np.sin(3 * t), 0, 0,
         t + np.pi / 2], np.float32)) for t in th])

    def rel(i, j):
        return NpSE3.compose(NpSE3.inverse(gt[i]), gt[j]).astype(np.float32)

    edges = [{"from": k - 1, "to": k,
              "rel_pose": NpSE3.retract(
                  rel(k - 1, k), rng.normal(0, 0.02, 6).astype(np.float32))}
             for k in range(1, K)]
    for c in range(K // 100):
        i = int(c * 100)
        edges.append({"from": i, "to": (i + K // 2) % K,
                      "rel_pose": rel(i, (i + K // 2) % K)})
    nodes = np.stack([NpSE3.retract(gt[k],
                                    rng.normal(0, 0.3, 6).astype(np.float32))
                      for k in range(K)])
    nodes[0] = gt[0]
    prob = {"group": "SE3", "nodes": nodes, "edges": edges}
    # Same certified config as bench.py's bench_pgo (abs floor above this
    # synthetic's 0.02/dim odometry-noise cost floor).
    cfg = PGOConfig(group="SE3", max_outer=30, cg_iters=100,
                    abs_tol_per_edge=2e-5)
    optimize_global_pose_graph(prob, cfg)
    t0 = time.perf_counter()
    G, info = optimize_global_pose_graph(prob, cfg)
    dt = time.perf_counter() - t0
    print(f"global PGO 20k SE(3) nodes / {len(edges)} edges: {dt:.2f} s hot "
          f"({info.get('iters', 0):.0f} outer iters, "
          f"err {info['err_init']:.2e} -> {info['err_final']:.2e})")


def main():
    import jax
    print(f"device: {jax.devices()[0]}")
    for name, (E, L, N), neq in (
            ("LM+Schur @ config#1 bucket (E=8, L=64, N=512, 6 iters)",
             (8, 64, 512), "onehot"),
            ("LM+Schur @ config#3 bucket (E=16, L=256, N=2048, 6 iters)",
             (16, 256, 2048), "onehot"),
            ("LM+Schur @ config#3 bucket, segmented neq",
             (16, 256, 2048), "segmented"),
            ("LM+Schur @ large window (E=256, L=4096, N=16384, 6 iters), "
             "onehot neq",
             (256, 4096, 16384), "onehot"),
            ("LM+Schur @ large window, segmented neq",
             (256, 4096, 16384), "segmented"),
    ):
        jitted, args, fetch = window_solver(E, L, N, neq=neq)
        measure(name, jitted, args, fetch=fetch)
    jitted, args, fetch = spd_inverse_prog()
    measure("batched SPD inverse [20480, 6, 6]", jitted, args, fetch=fetch)
    pgo_20k()


if __name__ == "__main__":
    main()
