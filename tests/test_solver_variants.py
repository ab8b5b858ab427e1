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


def test_segmented_neq_matches_onehot():
    """The segmented normal-equation reduction (no dense [N*od, P]
    Jacobian; SolverConfig.neq) must produce the same normal equations as
    the one-hot path — identical math, different reduction order, so the
    solves agree to f32 reduction tolerance.  Exercised across models
    (point landmarks + priors, stereo with sensor pose)."""
    import dataclasses

    import jax
    import __graft_entry__ as ge
    from srba_tpu.solver.lm import make_solver_impl
    from srba_tpu.solver.window import build_window
    from srba_tpu.solver.lm import WindowBatch
    import jax.numpy as jnp

    cfg, batch = ge._stereo_window()
    for neq in ("onehot", "segmented"):
        solve, _ = make_solver_impl(dataclasses.replace(cfg, neq=neq))
        e, l, info = jax.jit(solve)(batch)
        if neq == "onehot":
            e0, l0, err0 = e, l, float(info["err_final"])
        else:
            assert float(info["err_final"]) == pytest.approx(
                err0, rel=1e-3, abs=1e-8)
            np.testing.assert_allclose(np.asarray(e), np.asarray(e0),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(l), np.asarray(l0),
                                       rtol=1e-3, atol=1e-4)


def test_segmented_neq_engine_equivalence():
    """End-to-end: a full engine run (range-bearing with edge priors) under
    each reduction backend lands on the same map."""
    import dataclasses

    outs = []
    for neq in ("onehot", "segmented"):
        eng = _run("schur_dense_cholesky")
        if neq == "segmented":
            eng2 = SrbaEngine(
                "RangeBearing2D",
                params=SrbaParams(max_tree_depth=3, max_optimize_depth=3))
            eng2._solver_cfg = dataclasses.replace(eng2._solver_cfg,
                                                   neq="segmented")
            world = make_world_loop_2d(num_kfs=15, radius=7.0,
                                       num_landmarks=40, seed=5)
            ds = observe(world, "RangeBearing2D", noise_std=0.004,
                         sensor_range=6.0, odo_noise_std=0.015, seed=5)
            for k, frame in enumerate(ds.frames):
                eng2.define_new_keyframe(
                    [Observation(lm_id=m, z=z) for m, z in frame],
                    edge_init={k - 1: ds.odometry[k - 1]} if k else None)
            eng = eng2
        outs.append(eng.eval_overall_squared_error())
    assert outs[1] == pytest.approx(outs[0], rel=1e-3, abs=1e-6)


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
