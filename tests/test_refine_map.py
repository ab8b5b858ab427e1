"""Map-parallel refinement sweeps (M4): error decrease, ownership
disjointness, mesh-sharded parity with the single-device sweep."""

import numpy as np
import pytest

from srba_tpu import Observation, SrbaEngine, SrbaParams
from srba_tpu.models.noise import NoiseIdentity
from srba_tpu.utils.datasets import make_world_loop_2d, observe


def _build_engine(num_kfs=30, seed=6, run_local=True):
    world = make_world_loop_2d(num_kfs=num_kfs, radius=8.0,
                               num_landmarks=70, seed=seed)
    ds = observe(world, "RangeBearing2D", noise_std=0.004, sensor_range=6.0,
                 odo_noise_std=0.02, seed=seed)
    # Calibrated whitening: see test_e2e_rb2d._run (edge priors make the
    # observation/odometry information RATIO meaningful).
    eng = SrbaEngine(
        "RangeBearing2D", noise=NoiseIdentity(0.004),
        params=SrbaParams(max_tree_depth=4, max_optimize_depth=4))
    for k, frame in enumerate(ds.frames):
        obs = [Observation(lm_id=m, z=z) for m, z in frame]
        edge_init = {k - 1: ds.odometry[k - 1]} if k > 0 else None
        eng.define_new_keyframe(obs, edge_init=edge_init,
                                run_local_optimization=run_local)
    return eng, world


def test_sweep_reduces_error_from_odometry():
    # Build WITHOUT per-KF optimization: sweeps must pull the raw-odometry
    # map toward the observations.
    eng, _ = _build_engine(run_local=False)
    err0 = eng.eval_overall_squared_error()
    info = eng.refine_map(sweeps=3, stride=3)
    err1 = eng.eval_overall_squared_error()
    assert info["windows"] > 0
    assert err1 < 0.5 * err0, (err0, err1)


def test_sweep_is_stable_on_optimized_map():
    eng, _ = _build_engine(run_local=True)
    err0 = eng.eval_overall_squared_error()
    eng.refine_map(sweeps=2, stride=3)
    err1 = eng.eval_overall_squared_error()
    assert err1 <= err0 * 1.05 + 1e-9


def test_mesh_sweep_matches_single_device():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (CPU mesh)")
    from srba_tpu.parallel.sharding import make_mesh

    eng1, _ = _build_engine(run_local=False, seed=8)
    eng2, _ = _build_engine(run_local=False, seed=8)
    eng1.refine_map(sweeps=2, stride=3)
    mesh = make_mesh(4)
    eng2.refine_map(sweeps=2, stride=3, mesh=mesh)
    e1 = eng1.eval_overall_squared_error()
    e2 = eng2.eval_overall_squared_error()
    assert e1 == pytest.approx(e2, rel=1e-3, abs=1e-7)


def test_sweep_then_incremental_continues():
    eng, world = _build_engine(run_local=True)
    eng.refine_map(sweeps=1)
    # Engine keeps operating incrementally after a sweep.
    ds = observe(world, "RangeBearing2D", noise_std=0.004, sensor_range=6.0,
                 odo_noise_std=0.02, seed=99)
    frame = ds.frames[-1]
    eng.define_new_keyframe(
        [Observation(lm_id=m, z=z) for m, z in frame],
        edge_init={eng.num_keyframes - 1: ds.odometry[-1]})
    assert np.isfinite(eng.eval_overall_squared_error())
