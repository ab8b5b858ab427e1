"""SE(2)/SE(3) group-law tests (reference analog: MRPT pose classes +
``SE_traits`` pseudo-exponential; SURVEY.md M0 acceptance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srba_tpu.ops.lie import (
    SE2, SE3, quat_exp, quat_log, quat_mul, quat_normalize, quat_rotate,
    quat_to_matrix, wrap_angle, se2_to_se3,
)

KEY = jax.random.PRNGKey(0)
ATOL = 2e-5


def _rand(group, n, key=KEY):
    return group.rand(key, n)


@pytest.mark.parametrize("group", [SE2, SE3])
class TestGroupLaws:
    def test_identity(self, group):
        p = _rand(group, 16)
        ident = jnp.broadcast_to(group.identity(), p.shape)
        np.testing.assert_allclose(group.compose(p, ident), p, atol=ATOL)
        np.testing.assert_allclose(group.compose(ident, p), p, atol=ATOL)

    def test_inverse(self, group):
        p = _rand(group, 16)
        ii = group.compose(p, group.inverse(p))
        np.testing.assert_allclose(
            ii, jnp.broadcast_to(group.identity(), ii.shape), atol=ATOL
        )

    def test_associativity(self, group):
        k1, k2, k3 = jax.random.split(KEY, 3)
        a, b, c = (group.rand(k, 8) for k in (k1, k2, k3))
        lhs = group.compose(group.compose(a, b), c)
        rhs = group.compose(a, group.compose(b, c))
        # Compare via action on points (angle wrap makes raw storage differ).
        pt = jax.random.normal(k1, (8, group.point_dim))
        np.testing.assert_allclose(
            group.apply(lhs, pt), group.apply(rhs, pt), atol=1e-4
        )

    def test_apply_matches_compose(self, group):
        """apply(a, apply(b, x)) == apply(compose(a,b), x)."""
        k1, k2 = jax.random.split(KEY)
        a, b = group.rand(k1, 8), group.rand(k2, 8)
        pt = jax.random.normal(k1, (8, group.point_dim))
        np.testing.assert_allclose(
            group.apply(a, group.apply(b, pt)),
            group.apply(group.compose(a, b), pt),
            atol=1e-4,
        )

    def test_pexp_plog_roundtrip(self, group):
        d = jax.random.normal(KEY, (16, group.dof)) * 0.3
        np.testing.assert_allclose(group.plog(group.pexp(d)), d, atol=ATOL)

    def test_retract_zero(self, group):
        p = _rand(group, 8)
        z = jnp.zeros((8, group.dof))
        pt = jax.random.normal(KEY, (8, group.point_dim))
        np.testing.assert_allclose(
            group.apply(group.retract(p, z), pt), group.apply(p, pt), atol=ATOL
        )

    def test_local_err_zero_at_same_pose(self, group):
        p = _rand(group, 8)
        err = group.local_err(p, p)
        np.testing.assert_allclose(err, jnp.zeros_like(err), atol=ATOL)

    def test_jittable(self, group):
        p = _rand(group, 8)
        f = jax.jit(lambda a, b: group.compose(a, group.inverse(b)))
        np.testing.assert_allclose(
            f(p, p), jnp.broadcast_to(group.identity(), p.shape), atol=ATOL
        )


class TestQuaternions:
    def test_exp_log_roundtrip(self):
        # Roundtrip holds only for |w| < pi (beyond that, log returns the
        # wrapped equivalent rotation) — keep samples inside the ball.
        w = jax.random.normal(KEY, (32, 3)) * 0.8
        w = w * (3.0 / jnp.maximum(3.0, jnp.linalg.norm(w, axis=-1, keepdims=True)))
        np.testing.assert_allclose(quat_log(quat_exp(w)), w, atol=1e-4)

    def test_small_angle(self):
        w = jnp.asarray([[1e-6, -2e-7, 3e-7], [0.0, 0.0, 0.0]])
        q = quat_exp(w)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(quat_log(q), w, atol=1e-6)

    def test_rotate_matches_matrix(self):
        q = quat_normalize(jax.random.normal(KEY, (16, 4)))
        v = jax.random.normal(KEY, (16, 3))
        rv = quat_rotate(q, v)
        mv = jnp.einsum("bij,bj->bi", quat_to_matrix(q), v)
        np.testing.assert_allclose(rv, mv, atol=1e-5)

    def test_mul_matches_matrix_product(self):
        k1, k2 = jax.random.split(KEY)
        q1 = quat_normalize(jax.random.normal(k1, (8, 4)))
        q2 = quat_normalize(jax.random.normal(k2, (8, 4)))
        m = jnp.einsum("bij,bjk->bik", quat_to_matrix(q1), quat_to_matrix(q2))
        np.testing.assert_allclose(quat_to_matrix(quat_mul(q1, q2)), m, atol=1e-5)


def test_wrap_angle():
    th = jnp.asarray([0.0, 3.5, -3.5, 10.0, -10.0, np.pi - 1e-4])
    w = wrap_angle(th)
    assert np.all(np.abs(np.asarray(w)) <= np.pi + 1e-6)
    np.testing.assert_allclose(jnp.sin(w), jnp.sin(th), atol=1e-6)
    np.testing.assert_allclose(jnp.cos(w), jnp.cos(th), atol=1e-6)


def test_se2_embedding():
    p2 = SE2.rand(KEY, 8)
    p3 = se2_to_se3(p2)
    pt2 = jax.random.normal(KEY, (8, 2))
    pt3 = jnp.concatenate([pt2, jnp.zeros((8, 1))], axis=-1)
    out2 = SE2.apply(p2, pt2)
    out3 = SE3.apply(p3, pt3)
    np.testing.assert_allclose(out3[..., :2], out2, atol=1e-5)
    np.testing.assert_allclose(out3[..., 2], 0.0, atol=1e-6)
