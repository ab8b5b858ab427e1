"""SPMD solver tests on the virtual 8-device CPU mesh: the sharded
(distributed-Schur) solve must match the single-device solve (SURVEY.md §5,
shard-count-invariance)."""

import numpy as np
import pytest

import jax

from srba_tpu.parallel.sharding import make_mesh, make_spmd_solver, shard_batch
from srba_tpu.solver.lm import SolverConfig, get_solver
from tests.test_solver import CFG, _make_batch, _two_kf_problem
from srba_tpu.solver.window import build_window


@pytest.fixture(scope="module")
def problem_batch():
    state, graph, gt_edge, lms = _two_kf_problem(
        noise=0.005, edge_guess=[-0.9, -0.15, 0.05], seed=4)
    arrays, plan = build_window(state, graph, 1, 3, 3)
    return _make_batch(arrays), gt_edge


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_spmd_matches_single_device(problem_batch, n_dev):
    batch, gt_edge = problem_batch
    assert len(jax.devices()) >= n_dev, "conftest sets 8 virtual CPU devices"

    solve1, _ = get_solver(CFG)
    e1, l1, info1 = solve1(batch)

    mesh = make_mesh(n_dev)
    solveN, evalN = make_spmd_solver(CFG, mesh)
    sbatch = shard_batch(batch, mesh)
    eN, lN, infoN = solveN(sbatch)

    np.testing.assert_allclose(np.asarray(e1), np.asarray(eN),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lN),
                               atol=1e-4, rtol=1e-4)
    assert float(infoN["err_final"]) == pytest.approx(
        float(info1["err_final"]), rel=1e-3, abs=1e-7)
    assert float(infoN["num_obs"]) == float(info1["num_obs"])
    # Eval-error path under SPMD agrees too.
    err = float(evalN(sbatch))
    _, eval1 = get_solver(CFG)
    assert err == pytest.approx(float(eval1(batch)), rel=1e-4, abs=1e-8)


def test_spmd_recovers_gt(problem_batch):
    batch, gt_edge = problem_batch
    mesh = make_mesh(8)
    solveN, _ = make_spmd_solver(CFG, mesh)
    eN, _, infoN = solveN(shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(eN)[0], gt_edge, atol=5e-2)
    assert float(infoN["err_final"]) < float(infoN["err_init"])
