"""Host numpy geometry must match the device jnp geometry exactly."""

import jax
import numpy as np

from srba_tpu.ops.lie import SE2, SE3
from srba_tpu.ops.np_lie import NpSE2, NpSE3, compose_path

KEY = jax.random.PRNGKey(5)


def _pairs():
    k1, k2 = jax.random.split(KEY)
    return [
        (SE2, NpSE2, np.asarray(SE2.rand(k1, 8)), np.asarray(SE2.rand(k2, 8))),
        (SE3, NpSE3, np.asarray(SE3.rand(k1, 8)), np.asarray(SE3.rand(k2, 8))),
    ]


def test_compose_inverse_apply_match():
    for dev, host, a, b in _pairs():
        np.testing.assert_allclose(
            host.compose(a, b), np.asarray(dev.compose(a, b)), atol=1e-5)
        np.testing.assert_allclose(
            host.inverse(a), np.asarray(dev.inverse(a)), atol=1e-5)
        pt = np.asarray(jax.random.normal(KEY, (8, dev.point_dim)))
        np.testing.assert_allclose(
            host.apply(a, pt), np.asarray(dev.apply(a, pt)), atol=1e-5)


def test_pexp_retract_match():
    for dev, host, a, _ in _pairs():
        d = np.asarray(jax.random.normal(KEY, (8, dev.dof))) * 0.3
        np.testing.assert_allclose(
            host.retract(a, d), np.asarray(dev.retract(a, d)), atol=1e-5)
        np.testing.assert_allclose(
            host.pexp(d), np.asarray(dev.pexp(d)), atol=1e-5)


def test_compose_path_signs():
    a = np.asarray(SE2.rand(KEY, 3))
    # path with mixed directions: T = a0 . inv(a1) . a2
    T = compose_path(NpSE2, a, [(0, 1), (1, -1), (2, 1)])
    want = NpSE2.compose(NpSE2.compose(a[0], NpSE2.inverse(a[1])), a[2])
    np.testing.assert_allclose(T, want, atol=1e-6)
