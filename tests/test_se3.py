import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu.core import se3


def rand_quat(rng, n=()):
    q = rng.standard_normal((*n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_matrix_product(rng):
    a, b = rand_quat(rng, (5,)), rand_quat(rng, (5,))
    m = np.asarray(se3.quat_to_matrix(se3.quat_mul(a, b)))
    mm = np.asarray(se3.quat_to_matrix(a)) @ np.asarray(se3.quat_to_matrix(b))
    np.testing.assert_allclose(m, mm, atol=1e-5)


def test_rotate_matches_matrix(rng):
    q = rand_quat(rng, (7,))
    v = rng.standard_normal((7, 3)).astype(np.float32)
    rv = np.asarray(se3.quat_rotate(q, v))
    mv = np.einsum("nij,nj->ni", np.asarray(se3.quat_to_matrix(q)), v)
    np.testing.assert_allclose(rv, mv, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    q = rand_quat(rng, (20,))
    q2 = np.asarray(se3.matrix_to_quat(se3.quat_to_matrix(q)))
    # sign-insensitive comparison
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q2, atol=1e-5)


def test_exp_log_roundtrip(rng):
    rv = rng.standard_normal((10, 3)).astype(np.float32) * 0.8
    out = np.asarray(se3.quat_log(se3.quat_exp(rv)))
    np.testing.assert_allclose(out, rv, atol=1e-5)
    # small-angle branch
    tiny = np.full((2, 3), 1e-10, np.float32)
    np.testing.assert_allclose(np.asarray(se3.quat_log(se3.quat_exp(tiny))),
                               tiny, atol=1e-8)


def test_slerp_endpoints_and_midpoint(rng):
    q0, q1 = rand_quat(rng), rand_quat(rng)
    np.testing.assert_allclose(np.abs(np.sum(
        np.asarray(se3.quat_slerp(q0, q1, jnp.array(0.0))) * q0)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(
        np.asarray(se3.quat_slerp(q0, q1, jnp.array(1.0))) * q1)), 1.0, atol=1e-5)
    # midpoint is equidistant
    qm = se3.quat_slerp(q0, q1, jnp.array(0.5))
    d0 = np.abs(np.sum(np.asarray(qm) * q0))
    d1 = np.abs(np.sum(np.asarray(qm) * q1))
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_pose_compose_inverse(rng):
    p = se3.Pose(jnp.asarray(rand_quat(rng, (4,))),
                 jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)))
    ident = se3.compose(p, se3.inverse(p))
    np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ident.q)[..., 0]), 1, atol=1e-5)


def test_apply_compose_associativity(rng):
    a = se3.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(
        rng.standard_normal(3).astype(np.float32)))
    b = se3.Pose(jnp.asarray(rand_quat(rng)), jnp.asarray(
        rng.standard_normal(3).astype(np.float32)))
    pts = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    lhs = se3.apply(se3.compose(a, b), pts)
    rhs = se3.apply(a, se3.apply(b, pts))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_euler_deg_convention_matches_reference_matrix():
    """Reference getMatrix applies Ry(R0)·Rx(R1)·Rz(R2) in degrees
    (type_defs.h:134-146)."""
    roll, pitch, yaw = 10.0, -5.0, 30.0

    def rot(axis, deg):
        c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
        i, j = {(0): (1, 2), (1): (2, 0), (2): (0, 1)}[axis]
        m = np.eye(3)
        m[i, i] = m[j, j] = c
        m[i, j], m[j, i] = -s, s
        return m

    expected = rot(1, roll) @ rot(0, pitch) @ rot(2, yaw)
    got = np.asarray(se3.quat_to_matrix(
        se3.euler_deg_to_quat(roll, pitch, yaw)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_euler_deg_to_quat_np_matches_jnp(rng):
    """The host-side (readback-free) numpy variant must agree with the
    device implementation, including batched inputs."""
    angles = rng.uniform(-180, 180, size=(16, 3))
    q_np = se3.euler_deg_to_quat_np(angles[:, 0], angles[:, 1], angles[:, 2])
    q_j = np.asarray(se3.euler_deg_to_quat(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        angles[:, 2].astype(np.float32)))
    # q and -q are the same rotation; align signs before comparing
    sign = np.sign(np.sum(q_np * q_j, -1, keepdims=True))
    np.testing.assert_allclose(q_np * sign, q_j, atol=1e-5)
    assert q_np.dtype == np.float32


def test_retract_log(rng):
    p = se3.Pose(jnp.asarray(rand_quat(rng)),
                 jnp.asarray(rng.standard_normal(3).astype(np.float32)))
    delta = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.1)
    p2 = se3.retract(p, delta)
    rel = se3.compose(p2, se3.inverse(p))
    np.testing.assert_allclose(np.asarray(se3.quat_log(rel.q)),
                               np.asarray(delta[:3]), atol=1e-5)
