"""Loop-closure candidate detection + verification driver.

Host-side proposal (cheap O(K²) numpy over keyframe positions), device-side
verification (GICP between the candidate keyframes' scans).  Accepted
closures become pose-pose edges; the solver does the rest.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from veloslam_tpu.config import GraphConfig
from veloslam_tpu.core import se3
from veloslam_tpu.registration import gicp


def find_candidates(positions: np.ndarray, *, radius: float = 15.0,
                    min_gap: int = 50, max_per_keyframe: int = 1
                    ) -> List[Tuple[int, int]]:
    """Keyframe index pairs (i < j) that are spatially close but temporally
    distant — potential loop closures."""
    n = len(positions)
    if n == 0:
        return []
    d = np.linalg.norm(positions[:, None, :2] - positions[None, :, :2],
                       axis=-1)
    cands: List[Tuple[int, int]] = []
    taken = np.zeros(n, np.int64)
    ii, jj = np.nonzero((d < radius) & (np.triu(np.ones((n, n), bool),
                                                k=min_gap)))
    order = np.argsort(d[ii, jj])
    for k in order:
        i, j = int(ii[k]), int(jj[k])
        if taken[i] >= max_per_keyframe or taken[j] >= max_per_keyframe:
            continue
        taken[i] += 1
        taken[j] += 1
        cands.append((i, j))
    return cands


def verify_closure(pts_i, mask_i, pts_j, mask_j, rel_prior: se3.Pose,
                   *, voxel_size: float = 1.0, capacity: int = 16384,
                   iterations: int = 20,
                   max_mean_error: float = 0.05,
                   min_matches: int = 2000) -> Optional[se3.Pose]:
    """Register keyframe j's scan against keyframe i's; accept if the
    converged fit is tight.  Returns the measured relative pose or None.

    Scans are in their own keyframe (sensor) frames; `rel_prior` is the
    initial guess for T_i⁻¹∘T_j (e.g. from current graph estimates).
    """
    grid = gicp.build_plane_grid(pts_i, mask_i, jnp.zeros(3), voxel_size,
                                 capacity=capacity)
    res = gicp.register(pts_j, mask_j, grid, rel_prior,
                        iterations=iterations)
    if int(res.n_matched) < min_matches:
        return None
    if float(res.mean_error) > max_mean_error:
        return None
    return res.pose


def verify_closures_batch(pts_i, mask_i, pts_j, mask_j,
                          rel_priors: se3.Pose, *,
                          voxel_size: float = 1.0, capacity: int = 16384,
                          iterations: int = 20,
                          max_mean_error: float = 0.05,
                          min_matches: int = 2000
                          ) -> List[Optional[se3.Pose]]:
    """Verify C candidate pairs in TWO dispatched programs (vmapped grid
    build + stacked-target register_batch) instead of 2·C — candidate
    sweeps after a detection burst cost one dispatch floor, not C.

    Args are stacked on a leading C axis: pts_i/pts_j (C, P, 3),
    mask_i/mask_j (C, P), rel_priors a Pose with (C, 4)/(C, 3) leaves.
    Returns, per candidate, the measured relative pose or None (same
    accept gates as `verify_closure`).
    """
    grids = jax.vmap(
        lambda p, m: gicp.build_plane_grid(p, m, jnp.zeros(3), voxel_size,
                                           capacity=capacity))(pts_i, mask_i)
    res = gicp.register_batch(pts_j, mask_j, grids, rel_priors,
                              iterations=iterations, share_target=False)
    n_matched = np.asarray(res.n_matched)
    mean_error = np.asarray(res.mean_error)
    q = np.asarray(res.pose.q)
    t = np.asarray(res.pose.t)
    out: List[Optional[se3.Pose]] = []
    for k in range(len(n_matched)):
        if n_matched[k] < min_matches or mean_error[k] > max_mean_error \
                or not np.all(np.isfinite(t[k])):
            out.append(None)
        else:
            out.append(se3.Pose(jnp.asarray(q[k]), jnp.asarray(t[k])))
    return out
