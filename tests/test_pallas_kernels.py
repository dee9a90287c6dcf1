"""The Pallas fused normal-equations kernel must agree with the einsum
path.  On CPU the kernel runs in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu.core import se3
from veloslam_tpu.io import simulate as sim
from veloslam_tpu.registration import gicp
from veloslam_tpu.registration.pallas_kernels import (TILE,
                                                      fused_normal_equations)

from test_registration import _pad, _static_scan  # noqa: E402

INTERPRET = jax.devices()[0].platform == "cpu"


def test_fused_kernel_matches_einsum_reference():
    rng = np.random.default_rng(0)
    P = 4 * TILE
    p = rng.normal(0, 10, (P, 3)).astype(np.float32)
    n = rng.normal(size=(P, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    r = rng.normal(0, 0.1, P).astype(np.float32)
    w = (rng.random(P) < 0.7).astype(np.float32) * rng.random(P).astype(
        np.float32)
    rows = jnp.asarray(np.stack([p[:, 0], p[:, 1], p[:, 2],
                                 n[:, 0], n[:, 1], n[:, 2], r, w]))
    H, b, err_sum, n_hit, w_sum = fused_normal_equations(
        rows, interpret=INTERPRET)
    J = np.concatenate([np.cross(p, n), n], axis=1)
    Jw = J * w[:, None]
    np.testing.assert_allclose(np.asarray(H), Jw.T @ J, rtol=2e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), Jw.T @ r, rtol=2e-4,
                               atol=1e-3)
    np.testing.assert_allclose(float(w_sum), w.sum(), rtol=1e-5)
    assert int(n_hit) == int((w > 0).sum())
    np.testing.assert_allclose(float(err_sum), np.sum(w * np.abs(r)),
                               rtol=1e-5)


def test_normal_equations_pallas_parity():
    world = sim.World.demo(seed=5, n_posts=30, n_walls=10)
    tgt = _static_scan(world, np.array([0.0, 0.0, 2.0]), 0.0)
    src = _static_scan(world, np.array([0.2, 0.3, 2.0]), 0.01)
    P = 16384
    tp, tm = _pad(tgt, P)
    sp, sm = _pad(src, P)
    grid = gicp.build_plane_grid(tp, tm, np.zeros(3), 1.0, capacity=8192)
    pose = se3.Pose.identity()
    H0, b0, e0, n0 = gicp.normal_equations(sp, sm, pose, grid)
    H1, b1, e1, n1 = gicp.normal_equations(sp, sm, pose, grid,
                                           use_pallas=True,
                                           pallas_interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), rtol=1e-3,
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), rtol=1e-3,
                               atol=0.05)
    assert int(n0) == int(n1)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-4)
