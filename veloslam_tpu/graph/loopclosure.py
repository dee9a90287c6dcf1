"""Loop-closure candidate detection + verification driver.

Host-side proposal (cheap O(K²) numpy over keyframe positions), device-side
verification (GICP between the candidate keyframes' scans).  Accepted
closures become pose-pose edges; the solver does the rest.

Verification must defeat *perceptual aliasing*: a wrong match can be tight
(low residual, many correspondences) when the fit latches onto a subset of
the scene — the ground plane, one repeated facade.  No absolute spectral
threshold on the Gauss-Newton normal matrix H separates these across
scenes, because sparse scenes are *genuinely* weakly constrained.  The
discriminant used here is **self-normalized observability**: compare the
per-match-normalized smallest eigenvalue of the fit's H against that of
the target scan registered to itself at identity (the scene's intrinsic
observability ceiling).  A genuine revisit sees the same structure, so its
ratio is ≈1; an aliased match constrains strictly less than the ceiling.
Measured on five procedurally distinct worlds: genuine revisits 0.88-1.14
(0.32-0.58 at 2 m offset / partial overlap), aliased matches ≤0.67 and
usually ≪0.1.  Clear cases are decided by the ratio alone; the gray zone
(obs_reject..obs_accept) is tie-broken by a reciprocal-consistency check
(register i→j from the inverted measurement; the composed round trip must
be ≈identity), which costs one extra registration only when needed.
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


def _lam_min_per_match(H: np.ndarray, n_matched: int) -> float:
    """Smallest eigenvalue of a 6x6 GN normal matrix, normalized by the
    correspondence count (H scales linearly with matches, so this removes
    the overlap-fraction confound)."""
    if not np.all(np.isfinite(H)):
        return 0.0
    lam = float(np.linalg.eigvalsh(H)[0])
    return max(lam, 0.0) / max(int(n_matched), 1)


def _cycle_error(fwd: se3.Pose, bwd: se3.Pose) -> Tuple[float, float]:
    """(translation m, rotation deg) of the forward∘backward round trip."""
    comp = se3.compose(fwd, bwd)
    t = float(jnp.linalg.norm(comp.t))
    ang = float(2.0 * jnp.arccos(jnp.clip(jnp.abs(comp.q[0]), 0.0, 1.0)))
    return t, float(np.rad2deg(ang))


def verify_closure(pts_i, mask_i, pts_j, mask_j, rel_prior: se3.Pose,
                   *, voxel_size: float = 1.0, capacity: int = 16384,
                   iterations: int = 20,
                   max_mean_error: float = 0.05,
                   min_matches: int = 2000,
                   obs_accept: float = 0.75,
                   obs_reject: float = 0.10,
                   max_cycle_t: float = 0.3,
                   max_cycle_rot_deg: float = 2.0) -> Optional[se3.Pose]:
    """Register keyframe j's scan against keyframe i's; accept if the
    converged fit is tight AND not perceptually aliased (see module
    docstring).  Returns the measured relative pose or None.

    Scans are in their own keyframe (sensor) frames; `rel_prior` is the
    initial guess for T_i⁻¹∘T_j (e.g. from current graph estimates).
    """
    # Coarse-to-fine: a 4 m-voxel pass first widens the convergence basin
    # beyond the fine grid's ±1-voxel correspondence reach (the
    # appearance channel's prior has no translation; see
    # runtime/devfinalize.verify_closures_device).
    grid_c = gicp.build_plane_grid(pts_i, mask_i, jnp.zeros(3),
                                   4.0 * voxel_size, capacity=capacity // 4,
                                   min_planarity=0.05)
    res_c = gicp.register(pts_j, mask_j, grid_c, rel_prior, iterations=6,
                          max_dist=6.0 * voxel_size)
    grid_i = gicp.build_plane_grid(pts_i, mask_i, jnp.zeros(3), voxel_size,
                                   capacity=capacity)
    res = gicp.register(pts_j, mask_j, grid_i, res_c.pose,
                        iterations=iterations)
    if int(res.n_matched) < min_matches:
        return None
    if float(res.mean_error) > max_mean_error:
        return None
    # Self-normalized observability (scene ceiling from i vs its own grid).
    H_self, _, _, n_self = gicp.normal_equations(
        pts_i, mask_i, se3.Pose.identity(), grid_i)
    ceiling = _lam_min_per_match(np.asarray(H_self), int(n_self))
    rel_obs = (_lam_min_per_match(np.asarray(res.H), int(res.n_matched))
               / max(ceiling, 1e-12))
    if rel_obs < obs_reject:
        return None
    if rel_obs < obs_accept:
        # Gray zone: reciprocal-consistency tie-break.
        grid_j = gicp.build_plane_grid(pts_j, mask_j, jnp.zeros(3),
                                       voxel_size, capacity=capacity)
        bwd = gicp.register(pts_i, mask_i, grid_j, se3.inverse(res.pose),
                            iterations=iterations)
        cyc_t, cyc_r = _cycle_error(res.pose, bwd.pose)
        if cyc_t > max_cycle_t or cyc_r > max_cycle_rot_deg:
            return None
    return res.pose


def verify_closures_batch(pts_i, mask_i, pts_j, mask_j,
                          rel_priors: se3.Pose, *,
                          voxel_size: float = 1.0, capacity: int = 16384,
                          iterations: int = 20,
                          max_mean_error: float = 0.05,
                          min_matches: int = 2000,
                          obs_accept: float = 0.75,
                          obs_reject: float = 0.10,
                          max_cycle_t: float = 0.3,
                          max_cycle_rot_deg: float = 2.0
                          ) -> List[Optional[se3.Pose]]:
    """Verify C candidate pairs in a handful of dispatched programs
    (vmapped grid build + stacked-target register_batch + vmapped
    self-observability; one extra reverse register_batch only if some
    candidate lands in the observability gray zone) instead of ~4·C —
    candidate sweeps after a detection burst cost dispatch floors, not C.

    Args are stacked on a leading C axis: pts_i/pts_j (C, P, 3),
    mask_i/mask_j (C, P), rel_priors a Pose with (C, 4)/(C, 3) leaves.
    Returns, per candidate, the measured relative pose or None (same
    accept gates as `verify_closure`).
    """
    # Coarse-to-fine (see verify_closure): 4 m-voxel pass, then fine.
    grids_c = jax.vmap(
        lambda p, m: gicp.build_plane_grid(p, m, jnp.zeros(3),
                                           4.0 * voxel_size,
                                           capacity=capacity // 4,
                                           min_planarity=0.05)
    )(pts_i, mask_i)
    res_c = gicp.register_batch(pts_j, mask_j, grids_c, rel_priors,
                                iterations=6, share_target=False,
                                max_dist=6.0 * voxel_size)
    grids_i = jax.vmap(
        lambda p, m: gicp.build_plane_grid(p, m, jnp.zeros(3), voxel_size,
                                           capacity=capacity))(pts_i, mask_i)
    res = gicp.register_batch(pts_j, mask_j, grids_i, res_c.pose,
                              iterations=iterations, share_target=False)
    H_self, _, _, n_self = jax.vmap(
        lambda p, m, g: gicp.normal_equations(p, m, se3.Pose.identity(), g)
    )(pts_i, mask_i, grids_i)

    n_matched = np.asarray(res.n_matched)
    mean_error = np.asarray(res.mean_error)
    q = np.asarray(res.pose.q)
    t = np.asarray(res.pose.t)
    Hs = np.asarray(res.H)
    H_self = np.asarray(H_self)
    n_self = np.asarray(n_self)

    C = len(n_matched)
    rel_obs = np.zeros(C)
    tight = np.zeros(C, bool)
    for k in range(C):
        tight[k] = (n_matched[k] >= min_matches
                    and mean_error[k] <= max_mean_error
                    and np.all(np.isfinite(t[k])))
        if tight[k]:
            ceiling = _lam_min_per_match(H_self[k], int(n_self[k]))
            rel_obs[k] = (_lam_min_per_match(Hs[k], int(n_matched[k]))
                          / max(ceiling, 1e-12))

    gray = tight & (rel_obs >= obs_reject) & (rel_obs < obs_accept)
    cycle_ok = np.ones(C, bool)
    if np.any(gray):
        # One reverse pass for the whole batch (static shapes); only the
        # gray candidates' results are consulted.
        grids_j = jax.vmap(
            lambda p, m: gicp.build_plane_grid(p, m, jnp.zeros(3),
                                               voxel_size,
                                               capacity=capacity)
        )(pts_j, mask_j)
        inv = jax.vmap(se3.inverse)(se3.Pose(jnp.asarray(q), jnp.asarray(t)))
        bwd = gicp.register_batch(pts_i, mask_i, grids_j, inv,
                                  iterations=iterations, share_target=False)
        bq = np.asarray(bwd.pose.q)
        bt = np.asarray(bwd.pose.t)
        for k in np.nonzero(gray)[0]:
            cyc_t, cyc_r = _cycle_error(
                se3.Pose(jnp.asarray(q[k]), jnp.asarray(t[k])),
                se3.Pose(jnp.asarray(bq[k]), jnp.asarray(bt[k])))
            cycle_ok[k] = (cyc_t <= max_cycle_t
                           and cyc_r <= max_cycle_rot_deg)

    out: List[Optional[se3.Pose]] = []
    for k in range(C):
        ok = tight[k] and rel_obs[k] >= obs_reject and (
            rel_obs[k] >= obs_accept or cycle_ok[k])
        out.append(se3.Pose(jnp.asarray(q[k]), jnp.asarray(t[k]))
                   if ok else None)
    return out
