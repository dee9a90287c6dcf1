"""D2D (Gaussian-to-Gaussian) registration: correctness vs autodiff,
known-transform recovery, and the corner-voxel advantage over
point-to-plane GICP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veloslam_tpu.core import se3
from veloslam_tpu.registration import d2d, gicp
from veloslam_tpu.registration import voxel as vx


def _corner_scene(rng, n_walls=24, extent=30.0, pts_per=256):
    """Wall pairs meeting at right angles — corner voxels everywhere."""
    pts = []
    for _ in range(n_walls):
        c = rng.uniform(-extent, extent, 2)
        h = rng.uniform(0.0, 3.0, (pts_per, 1))
        u = rng.uniform(-2.0, 2.0, (pts_per, 1))
        # two orthogonal faces sharing the corner line at c
        a = np.concatenate([c[0] + u, np.full_like(u, c[1]), h], -1)
        b = np.concatenate([np.full_like(u, c[0]), c[1] + u, h], -1)
        pts += [a, b]
    ground = np.concatenate([rng.uniform(-extent, extent, (4096, 2)),
                             np.zeros((4096, 1))], -1)
    pts.append(ground)
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    surf = _corner_scene(rng)
    # two independent samplings of the same surfaces (sensor noise)
    a = surf + rng.normal(0, 0.01, surf.shape).astype(np.float32)
    b = surf[rng.permutation(len(surf))] \
        + rng.normal(0, 0.01, surf.shape).astype(np.float32)
    return a, b


@pytest.mark.slow
def test_d2d_gradient_matches_autodiff(scene):
    """b must equal the gradient of the half-Mahalanobis cost at the
    linearization point (W held fixed — the Gauss-Newton convention)."""
    a, b_pts = scene
    rng = np.random.default_rng(0)
    src = vx.build_grid(jnp.asarray(a), jnp.ones(len(a), bool),
                        np.zeros(3), 1.0, capacity=4096)
    tgt = vx.build_grid(jnp.asarray(b_pts), jnp.ones(len(b_pts), bool),
                        np.zeros(3), 1.0, capacity=4096)
    usable = tgt.occupied & (tgt.count >= 3)
    pose = se3.Pose(jnp.asarray(se3.euler_deg_to_quat_np(1.0, -2.0, 3.0)),
                    jnp.asarray([0.1, -0.2, 0.05], jnp.float32))

    H, b, err, n = d2d.d2d_normal_equations(src, pose, tgt, usable)

    def half_cost(delta):
        p = se3.retract(pose, delta)
        R = se3.quat_to_matrix(p.q)
        mu_s = se3.apply(p, src.mean)
        src_ok = src.occupied & (src.count >= 3.0)
        idx = vx.lookup_nearest(tgt, se3.apply(pose, src.mean), src_ok,
                                usable)        # correspondences FIXED
        hit = idx >= 0
        safe = jnp.maximum(idx, 0)
        r = mu_s - tgt.mean[safe]
        hit &= jnp.sum(jax.lax.stop_gradient(r) ** 2, -1) < 4.0
        R0 = se3.quat_to_matrix(pose.q)       # W fixed at linearization
        cov_rot = jnp.einsum("ij,vjk,lk->vil", R0,
                             vx.normalized_cov(src.cov), R0)
        W = vx.regularized_inverse(
            vx.normalized_cov(tgt.cov)[safe] + cov_rot, eps=1e-3)
        W = W * jnp.where(hit, src.count, 0.0)[:, None, None]
        W = jax.lax.stop_gradient(W)
        return 0.5 * jnp.einsum("vi,vij,vj->", r, W, r)

    g = jax.grad(half_cost)(jnp.zeros(6, jnp.float32))
    np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                               rtol=2e-2, atol=2e-2)


def test_d2d_recovers_transform(scene):
    a, b_pts = scene
    true = se3.Pose(jnp.asarray(se3.euler_deg_to_quat_np(0.5, -0.8, 4.0)),
                    jnp.asarray([0.4, -0.3, 0.1], jnp.float32))
    moved = np.asarray(se3.apply(se3.inverse(true), jnp.asarray(a)))
    res = d2d.register_scans_d2d(
        jnp.asarray(moved), jnp.ones(len(moved), bool),
        jnp.asarray(b_pts), jnp.ones(len(b_pts), bool),
        np.zeros(3), 1.0, iterations=20)
    t_err = np.linalg.norm(np.asarray(res.pose.t) - np.asarray(true.t))
    dq = abs(float(jnp.dot(res.pose.q, true.q)))
    assert t_err < 0.02, t_err
    assert dq > 0.999995, dq
    assert int(res.n_matched) > 500


def test_d2d_beats_point_to_plane_on_corners(scene):
    """The motivating case: corner-heavy geometry where averaged voxel
    'planes' mislead point-to-plane but fat Gaussians don't."""
    a, b_pts = scene
    true_t = np.array([0.25, -0.15, 0.0], np.float32)
    true = se3.Pose(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                    jnp.asarray(true_t))
    moved = np.asarray(se3.apply(se3.inverse(true), jnp.asarray(a)))

    res_d2d = d2d.register_scans_d2d(
        jnp.asarray(moved), jnp.ones(len(moved), bool),
        jnp.asarray(b_pts), jnp.ones(len(b_pts), bool),
        np.zeros(3), 1.0, iterations=20)

    # point-to-plane with a permissive planarity gate (so corner voxels
    # participate — the regime D2D is designed to fix)
    tgt_pg = gicp.build_plane_grid(jnp.asarray(b_pts),
                                   jnp.ones(len(b_pts), bool),
                                   np.zeros(3), 1.0, capacity=8192,
                                   min_planarity=0.0)
    res_pp = gicp.register(jnp.asarray(moved), jnp.ones(len(moved), bool),
                           tgt_pg, se3.Pose.identity(), iterations=20)

    err_d2d = np.linalg.norm(np.asarray(res_d2d.pose.t) - true_t)
    err_pp = np.linalg.norm(np.asarray(res_pp.pose.t) - true_t)
    assert err_d2d < 0.02, (err_d2d, err_pp)
    assert err_d2d <= err_pp + 1e-4, (err_d2d, err_pp)
