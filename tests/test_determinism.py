"""Determinism suite (M5, SURVEY.md §5): identical inputs must produce
identical maps run-to-run, and reductions must be stable across shard
counts (shard-count invariance is covered in test_sharding /
test_refine_map / test_global_pgo; here: bitwise run-to-run stability)."""

import numpy as np

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.utils.datasets import make_world_loop_2d, observe


def _run(seed=12, num_kfs=20):
    world = make_world_loop_2d(num_kfs=num_kfs, radius=7.0,
                               num_landmarks=50, seed=seed)
    ds = observe(world, "RangeBearing2D", noise_std=0.005, sensor_range=6.0,
                 odo_noise_std=0.01, seed=seed)
    eng = SrbaEngine(
        "RangeBearing2D",
        params=SrbaParams(max_tree_depth=3, max_optimize_depth=3))
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        edge_init = {k - 1: ds.odometry[k - 1]} if k > 0 else None
        eng.define_new_keyframe(obs, edge_init=edge_init)
    st = eng.get_rba_state()
    return (st.k2k_pose[: st.num_edges].copy(),
            st.lm_state[: st.num_lms].copy())


def test_engine_bitwise_reproducible():
    p1, l1 = _run()
    p2, l2 = _run()
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(l1, l2)


def test_pgo_bitwise_reproducible():
    from srba_tpu.ops.np_lie import NpSE2
    from srba_tpu.solver.global_graphslam import optimize_global_pose_graph

    rng = np.random.default_rng(4)
    K = 25
    gt = np.stack([np.asarray([np.cos(t), np.sin(t), t], np.float32)
                   for t in np.linspace(0, 2 * np.pi, K)])
    edges = [{"from": k - 1, "to": k,
              "rel_pose": NpSE2.retract(
                  NpSE2.compose(NpSE2.inverse(gt[k - 1]), gt[k]),
                  rng.normal(0, 0.02, 3).astype(np.float32))}
             for k in range(1, K)]
    edges.append({"from": 0, "to": K - 1,
                  "rel_pose": NpSE2.compose(NpSE2.inverse(gt[0]),
                                            gt[K - 1])})
    prob = {"group": "SE2", "nodes": gt.copy(), "edges": edges}
    G1, i1 = optimize_global_pose_graph(prob)
    G2, i2 = optimize_global_pose_graph(
        {"group": "SE2", "nodes": gt.copy(), "edges": edges})
    np.testing.assert_array_equal(G1, G2)
    assert i1["err_final"] == i2["err_final"]


def test_refine_map_reproducible():
    def go():
        world = make_world_loop_2d(num_kfs=18, radius=7.0, num_landmarks=40,
                                   seed=3)
        ds = observe(world, "RangeBearing2D", noise_std=0.005,
                     sensor_range=6.0, odo_noise_std=0.02, seed=3)
        eng = SrbaEngine(
            "RangeBearing2D",
            params=SrbaParams(max_tree_depth=3, max_optimize_depth=3))
        for k, frame in enumerate(ds.frames):
            eng.define_new_keyframe(
                [Observation(lm_id=m, z=z) for m, z in frame],
                edge_init={k - 1: ds.odometry[k - 1]} if k > 0 else None,
                run_local_optimization=False)
        eng.refine_map(sweeps=2, stride=3)
        st = eng.get_rba_state()
        return st.k2k_pose[: st.num_edges].copy()

    np.testing.assert_array_equal(go(), go())
