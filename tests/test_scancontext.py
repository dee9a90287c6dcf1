"""Scan-context descriptors: rotation invariance, yaw recovery, proposal."""

import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu.graph import scancontext as sc


def _world_points(seed=0, n=8192):
    """A structured synthetic world: clusters + walls (asymmetric so yaw
    is observable)."""
    rng = np.random.default_rng(seed)
    clusters = rng.uniform(-50, 50, (12, 2))
    pts = []
    for cx, cy in clusters:
        k = n // 12
        p = rng.normal(0, 1.5, (k, 3))
        p[:, 0] += cx
        p[:, 1] += cy
        p[:, 2] = np.abs(p[:, 2]) * 3.0
        pts.append(p)
    return np.concatenate(pts)[:n].astype(np.float32)


def _local_scan(world_pts, t, yaw):
    """Observe world points from pose (t, yaw): local = R(−yaw)·(p − t)."""
    c, s = np.cos(-yaw), np.sin(-yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return (world_pts - np.asarray(t, np.float32)) @ R.T


def test_descriptor_rotation_shift_and_yaw():
    w = _world_points()
    mask = jnp.ones(len(w), bool)
    for yaw_j in (0.5, -1.2, 2.8):
        a = sc.scan_context(jnp.asarray(_local_scan(w, [0, 0, 0], 0.0)),
                            mask)
        b = sc.scan_context(jnp.asarray(_local_scan(w, [0, 0, 0], yaw_j)),
                            mask)
        desc = jnp.stack([a, b])
        scores, shifts = sc.descriptor_scores(desc)
        assert float(scores[0, 1]) > 0.85, float(scores[0, 1])
        got = sc.relative_yaw(int(shifts[0, 1]))
        err = abs((got - yaw_j + np.pi) % (2 * np.pi) - np.pi)
        # sector resolution is 6 deg
        assert err < np.deg2rad(7), (got, yaw_j)


def test_descriptor_separates_places():
    w = _world_points()
    mask = jnp.ones(len(w), bool)
    same_a = sc.scan_context(jnp.asarray(_local_scan(w, [0, 0, 0], 0.0)),
                             mask)
    same_b = sc.scan_context(jnp.asarray(_local_scan(w, [1, -1, 0], 2.0)),
                             mask)
    far = sc.scan_context(jnp.asarray(_local_scan(w, [60, 45, 0], 0.7)),
                          mask)
    scores, _ = sc.descriptor_scores(jnp.stack([same_a, same_b, far]))
    assert float(scores[0, 1]) > 0.8           # revisit, rotated
    assert float(scores[0, 2]) < float(scores[0, 1]) - 0.15


def test_propose_gap_threshold_and_caps():
    K = 6
    scores = np.zeros((K, K), np.float32)
    shifts = np.zeros((K, K), np.int32)
    scores[0, 5] = 0.9
    scores[1, 5] = 0.8
    scores[0, 2] = 0.95          # gap too small
    scores[3, 4] = 0.99          # gap too small
    out = sc.propose(scores, shifts, n_valid=K, min_score=0.6, min_gap=3,
                     max_per_keyframe=1)
    assert out[0][:2] == (0, 5) and len(out) == 1  # kf5 already used
    out2 = sc.propose(scores, shifts, n_valid=K, min_score=0.6, min_gap=3,
                      max_per_keyframe=2)
    assert [(i, j) for i, j, *_ in out2] == [(0, 5), (1, 5)]
    out3 = sc.propose(scores, shifts, n_valid=K, min_score=0.6, min_gap=3,
                      max_per_keyframe=2, exclude={(0, 5)})
    assert [(i, j) for i, j, *_ in out3] == [(1, 5)]


def test_empty_descriptors_score_zero():
    a = jnp.zeros((2, sc.N_RINGS, sc.N_SECTORS))
    scores, _ = sc.descriptor_scores(a)
    assert np.allclose(np.asarray(scores), 0.0)


def test_yaw_prior_bootstraps_gicp():
    """End-to-end: scan-context yaw + zero translation is a good enough
    prior for the geometric verifier to recover a large relative pose that
    position-based proposal could never seed."""
    from veloslam_tpu.core import se3
    from veloslam_tpu.registration import gicp

    rng = np.random.default_rng(3)
    w = _world_points(seed=3, n=16384)
    # ground plane so z/pitch/roll are constrained too
    g = np.column_stack([rng.uniform(-60, 60, 8192),
                         rng.uniform(-60, 60, 8192),
                         np.zeros(8192)]).astype(np.float32)
    w = np.concatenate([w, g])
    mask = jnp.ones(len(w), bool)
    yaw_true = 2.2
    t_true = np.array([1.5, -0.8, 0.0], np.float32)
    scan_i = _local_scan(w, [0, 0, 0], 0.0)
    scan_j = _local_scan(w, t_true, yaw_true)

    desc = jnp.stack([sc.scan_context(jnp.asarray(scan_i), mask),
                      sc.scan_context(jnp.asarray(scan_j), mask)])
    scores, shifts = sc.descriptor_scores(desc)
    assert float(scores[0, 1]) > 0.7
    yaw0 = sc.relative_yaw(int(shifts[0, 1]))
    prior = se3.Pose(
        jnp.asarray([np.cos(yaw0 / 2), 0, 0, np.sin(yaw0 / 2)],
                    jnp.float32),
        jnp.zeros(3, jnp.float32))

    grid_i = gicp.build_plane_grid(jnp.asarray(scan_i), mask, jnp.zeros(3),
                                   1.0, capacity=16384)
    res = gicp.register(jnp.asarray(scan_j), mask, grid_i, prior,
                        iterations=30)
    # T_i⁻¹∘T_j: rotation yaw_true, translation t_true
    got_yaw = 2 * np.arctan2(float(res.pose.q[3]), float(res.pose.q[0]))
    err_yaw = abs((got_yaw - yaw_true + np.pi) % (2 * np.pi) - np.pi)
    assert err_yaw < np.deg2rad(2), (got_yaw, yaw_true)
    np.testing.assert_allclose(np.asarray(res.pose.t), t_true, atol=0.15)
