"""g2o import: round-trip against our exporter, and an externally-shaped
pose-graph benchmark (sphere-style SE3) solved by the global PGO."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.io.export import (get_global_graphslam_problem,
                                save_graphslam_g2o)
from srba_tpu.io.g2o import load_g2o
from srba_tpu.ops.np_lie import NpSE3
from srba_tpu.solver.global_graphslam import (PGOConfig,
                                              optimize_global_pose_graph)
from srba_tpu.utils.datasets import make_world_loop_2d, observe


def _small_engine():
    world = make_world_loop_2d(num_kfs=15, radius=5.0, num_landmarks=60,
                               seed=2)
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=5.0,
                 odo_noise_std=0.01, seed=2)
    eng = SrbaEngine("RangeBearing2D",
                     params=SrbaParams(max_tree_depth=3,
                                       max_optimize_depth=3))
    for k, frame in enumerate(ds.frames):
        eng.define_new_keyframe(
            [Observation(lm_id=m, z=z) for m, z in frame],
            edge_init={k - 1: ds.odometry[k - 1]} if k else None)
    return eng


def test_se2_roundtrip(tmp_path):
    eng = _small_engine()
    path = str(tmp_path / "graph.g2o")
    save_graphslam_g2o(eng, path)
    prob0 = get_global_graphslam_problem(eng)
    prob1 = load_g2o(path)
    assert prob1["group"] == "SE2"
    np.testing.assert_allclose(prob1["nodes"], prob0["nodes"],
                               atol=1e-6, rtol=1e-5)
    assert len(prob1["edges"]) == len(prob0["edges"])
    for e0, e1 in zip(prob0["edges"], prob1["edges"]):
        assert (e0["from"], e0["to"]) == (e1["from"], e1["to"])
        np.testing.assert_allclose(e1["rel_pose"], e0["rel_pose"],
                                   atol=1e-6, rtol=1e-5)
    # Exporter writes diag(w) info => importer's geometric mean recovers w
    # up to the median normalization.
    w0 = prob0["edge_weights"]
    w1 = prob1["edge_weights"]
    np.testing.assert_allclose(w1, w0 / np.median(w0), rtol=1e-2)


def _write_sphere_g2o(path, n_ring=40, n_rings=10, noise=0.05, seed=0):
    """Sphere2500-style SE3 benchmark at reduced size: a spiral over a
    sphere with odometry edges + inter-ring closures, noisy initial nodes,
    exact-ish edge measurements.  Returns ground-truth global poses."""
    rng = np.random.default_rng(seed)
    K = n_ring * n_rings
    gt = []
    for k in range(K):
        th = 2 * np.pi * (k % n_ring) / n_ring
        ph = np.pi * (k / K - 0.5)
        t = 10.0 * np.asarray([np.cos(ph) * np.cos(th),
                               np.cos(ph) * np.sin(th), np.sin(ph)])
        gt.append(NpSE3.retract(
            np.concatenate([t, [1, 0, 0, 0]]).astype(np.float32),
            np.asarray([0, 0, 0, 0, 0, th], np.float32)))
    gt = np.stack(gt)

    def rel(i, j):
        return NpSE3.compose(NpSE3.inverse(gt[i]), gt[j])

    lines = []
    for k in range(K):
        p = NpSE3.retract(gt[k], rng.normal(0, 0.5, 6).astype(np.float32)) \
            if k else gt[k]
        lines.append(
            f"VERTEX_SE3:QUAT {k} {p[0]} {p[1]} {p[2]} "
            f"{p[4]} {p[5]} {p[6]} {p[3]}")
    info = " ".join(
        str(v) for v in np.eye(6)[np.triu_indices(6)].astype(np.float64))

    def edge_line(i, j):
        r = NpSE3.retract(rel(i, j),
                          rng.normal(0, noise / 10, 6).astype(np.float32))
        return (f"EDGE_SE3:QUAT {i} {j} {r[0]} {r[1]} {r[2]} "
                f"{r[4]} {r[5]} {r[6]} {r[3]} {info}")

    for k in range(1, K):
        lines.append(edge_line(k - 1, k))
    for k in range(0, K - n_ring, 5):   # inter-ring closures
        lines.append(edge_line(k, k + n_ring))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return gt


def test_sphere_benchmark(tmp_path):
    """End-to-end external-format validation: import a sphere-style g2o
    problem with heavily noised initial nodes and recover the geometry."""
    from srba_tpu.utils.datasets import ate_rmse

    path = str(tmp_path / "sphere.g2o")
    gt = _write_sphere_g2o(path)
    prob = load_g2o(path)
    assert prob["group"] == "SE3" and len(prob["nodes"]) == 400
    init_ate = float(ate_rmse(prob["nodes"][:, :3], gt[:, :3]))
    G, info = optimize_global_pose_graph(
        prob, PGOConfig(group="SE3", chordal_init=True, max_outer=30,
                        cg_iters=100))
    final_ate = float(ate_rmse(G[:, :3], gt[:, :3]))
    assert info["err_final"] < info["err_init"]
    # Gauge: node 0 is pinned to its (exact) input, so ATE is meaningful.
    assert final_ate < 0.1 * init_ate, (init_ate, final_ate)
    assert final_ate < 0.2, final_ate


def test_anisotropic_info_import(tmp_path):
    """with_edge_info=True parses the FULL information matrices into
    eig-normalized shapes the PGO whitens with (and the solve runs)."""
    p = str(tmp_path / "aniso.g2o")
    # Tiny SE2 chain; second edge's info strongly favors y over x.
    lines = [
        "VERTEX_SE2 0 0 0 0",
        "VERTEX_SE2 1 1 0 0",
        "VERTEX_SE2 2 2 0 0",
        "EDGE_SE2 0 1 1 0 0 1 0 0 1 0 1",
        "EDGE_SE2 1 2 1 0 0 0.01 0 0 100 0 1",
    ]
    open(p, "w").write("\n".join(lines) + "\n")
    prob = load_g2o(p, with_edge_info=True)
    S = prob["edge_info_sqrt"]
    assert S.shape == (2, 3, 3)
    np.testing.assert_allclose(S[0], np.eye(3), atol=1e-6)
    # Edge 1: x-direction floored at sqrt(0.05), y at 1.
    assert S[1][1, 1] == pytest.approx(1.0, abs=1e-5)
    assert S[1][0, 0] == pytest.approx(np.sqrt(0.05), abs=1e-5)
    G, info = optimize_global_pose_graph(prob, PGOConfig(group="SE2"))
    assert np.isfinite(info["err_final"])


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.g2o"
    p.write_text("FIX 0\n# comment only\n")
    with pytest.raises(ValueError, match="no g2o"):
        load_g2o(str(p))
