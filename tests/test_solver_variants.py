"""Solver-engine selector (reference solver_LM_* analogs) and the
explicit-list ``optimize_edges`` semantics."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.utils.datasets import make_world_loop_2d, observe


def _run(solver, seed=5, num_kfs=15):
    world = make_world_loop_2d(num_kfs=num_kfs, radius=7.0,
                               num_landmarks=40, seed=seed)
    ds = observe(world, "RangeBearing2D", noise_std=0.004, sensor_range=6.0,
                 odo_noise_std=0.015, seed=seed)
    eng = SrbaEngine(
        "RangeBearing2D",
        params=SrbaParams(max_tree_depth=3, max_optimize_depth=3,
                          solver=solver))
    for k, frame in enumerate(ds.frames):
        eng.define_new_keyframe(
            [Observation(lm_id=m, z=z) for m, z in frame],
            edge_init={k - 1: ds.odometry[k - 1]} if k > 0 else None)
    return eng


def test_no_schur_matches_schur():
    e1 = _run("schur_dense_cholesky")
    e2 = _run("no_schur_dense_cholesky")
    err1 = e1.eval_overall_squared_error()
    err2 = e2.eval_overall_squared_error()
    # Same normal equations, different elimination order: same optimum.
    assert err2 == pytest.approx(err1, rel=5e-3, abs=1e-6)
    st1, st2 = e1.get_rba_state(), e2.get_rba_state()
    np.testing.assert_allclose(st2.k2k_pose[: st2.num_edges],
                               st1.k2k_pose[: st1.num_edges],
                               rtol=5e-2, atol=5e-3)


def test_optimize_edges_restricts_unknowns():
    eng = _run("schur_dense_cholesky")
    st = eng.get_rba_state()
    n_e = st.num_edges
    # Perturb every edge, then ask to optimize ONLY the last two.
    before = st.k2k_pose[:n_e].copy()
    target = {n_e - 1, n_e - 2}
    info = eng.optimize_edges(sorted(target))
    assert "err_final" in info
    st = eng.get_rba_state()
    after = st.k2k_pose[:n_e].copy()
    for e in range(n_e):
        if e not in target:
            np.testing.assert_array_equal(after[e], before[e]), e


def test_optimize_edges_with_landmark_list():
    eng = _run("schur_dense_cholesky")
    st = eng.get_rba_state()
    lm_before = st.lm_state[: st.num_lms].copy()
    keep_lms = {0, 1}
    eng.optimize_edges([st.num_edges - 1], sorted(keep_lms))
    st = eng.get_rba_state()
    for l in range(st.num_lms):
        if l not in keep_lms:
            np.testing.assert_array_equal(st.lm_state[l], lm_before[l])
