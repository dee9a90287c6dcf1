"""Landmark layer: typed map objects as struct-of-arrays + extraction.

Capability parity with the reference's map-object family (reference
MapObjects.h:11-46: UprightPost, Plane, Complex, GroundLineMark with binary
stream serialization; MapPatch.h:7-17 aggregates them per tile) — but where
the reference stops at data structures with no producers (SURVEY.md §0
"no code extracts features"), this module also *extracts* posts and planes
from the voxel-Gaussian map statistics, making the landmark layer live.

Storage is struct-of-arrays numpy (device-friendly, trivially serialized
via npz inside MapPatchData.save).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from veloslam_tpu.registration import voxel as vx


@dataclasses.dataclass
class Landmarks:
    """Per-patch landmark sets (SoA).

    posts:  (P, 5)  x, y, z_base, height, radius    (MapObjects.h:11-16)
    planes: (Q, 16) 4 plane coeffs + 4 corner xyz   (MapObjects.h:18-26)
    marks:  (M, 7)  2 endpoints xyz + width         (MapObjects.h:38-45)
    complexes: ragged — (center+bbox (K, 6), points offsets (K+1,),
                points (Npts, 3))                   (MapObjects.h:28-36)
    """

    posts: np.ndarray
    planes: np.ndarray
    marks: np.ndarray
    cplx_meta: np.ndarray
    cplx_offsets: np.ndarray
    cplx_points: np.ndarray

    @classmethod
    def empty(cls) -> "Landmarks":
        return cls(posts=np.zeros((0, 5), np.float64),
                   planes=np.zeros((0, 16), np.float64),
                   marks=np.zeros((0, 7), np.float64),
                   cplx_meta=np.zeros((0, 6), np.float64),
                   cplx_offsets=np.zeros(1, np.int64),
                   cplx_points=np.zeros((0, 3), np.float32))

    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {"lm_posts": self.posts, "lm_planes": self.planes,
                "lm_marks": self.marks, "lm_cplx_meta": self.cplx_meta,
                "lm_cplx_offsets": self.cplx_offsets,
                "lm_cplx_points": self.cplx_points}

    @classmethod
    def from_arrays(cls, d) -> "Landmarks":
        if "lm_posts" not in getattr(d, "files", d):
            return cls.empty()
        return cls(posts=d["lm_posts"], planes=d["lm_planes"],
                   marks=d["lm_marks"], cplx_meta=d["lm_cplx_meta"],
                   cplx_offsets=d["lm_cplx_offsets"],
                   cplx_points=d["lm_cplx_points"])

    def concat(self, other: "Landmarks") -> "Landmarks":
        off = other.cplx_offsets + len(self.cplx_points)
        return Landmarks(
            posts=np.concatenate([self.posts, other.posts]),
            planes=np.concatenate([self.planes, other.planes]),
            marks=np.concatenate([self.marks, other.marks]),
            cplx_meta=np.concatenate([self.cplx_meta, other.cplx_meta]),
            cplx_offsets=np.concatenate([self.cplx_offsets, off[1:]]),
            cplx_points=np.concatenate([self.cplx_points,
                                        other.cplx_points]))


# --- extraction from voxel statistics ----------------------------------------

def extract_posts(coords: np.ndarray, count: np.ndarray, mean: np.ndarray,
                  cov: np.ndarray, voxel_size: float,
                  min_stack: int = 3, min_points: int = 6,
                  max_radius: float = 0.8) -> np.ndarray:
    """Detect upright posts: vertical stacks of line-like voxels.

    A voxel is post-like when its dominant eigenvector is near-vertical and
    its horizontal spread is small; stacks of ≥ min_stack such voxels in
    the same (x, y) column become one UprightPost record (x, y, z_base,
    height, radius).
    """
    if len(coords) == 0:
        return np.zeros((0, 5))
    import numpy.linalg as la
    w, v = la.eigh(cov + 1e-9 * np.eye(3))
    dom = v[:, :, 2]                               # dominant eigenvector
    vertical = np.abs(dom[:, 2]) > 0.85
    horiz_sigma = np.sqrt(np.maximum(w[:, 0] + w[:, 1], 0.0))
    slim = horiz_sigma < max_radius
    ok = vertical & slim & (count >= min_points)
    if not ok.any():
        return np.zeros((0, 5))
    c = coords[ok]
    m = mean[ok]
    sig = horiz_sigma[ok]
    # Group by (x, y) column.
    col, inv = np.unique(c[:, :2], axis=0, return_inverse=True)
    # Reject columns belonging to wall runs: a sparsely-sampled wall also
    # produces vertical line voxels, but its columns come in contiguous
    # horizontal runs; a genuine post column is isolated (≤ 2 adjacent
    # post-like columns).
    col_set = {tuple(xy) for xy in col}
    n_adj = np.array([
        sum((cx + dx, cy + dy) in col_set
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0))
        for cx, cy in col])
    posts = []
    for i in range(len(col)):
        if n_adj[i] > 2:
            continue
        sel = inv == i
        if sel.sum() < min_stack:
            continue
        zs = c[sel, 2]
        # require a contiguous-ish stack
        if zs.max() - zs.min() + 1 > sel.sum() * 2:
            continue
        mm = m[sel]
        z_base = float(zs.min()) * voxel_size
        height = float(zs.max() - zs.min() + 1) * voxel_size
        posts.append([mm[:, 0].mean(), mm[:, 1].mean(), z_base, height,
                      float(np.median(sig[sel]))])
    return np.asarray(posts).reshape(-1, 5)


def extract_planes(coords: np.ndarray, count: np.ndarray, mean: np.ndarray,
                   cov: np.ndarray, voxel_size: float,
                   min_points: int = 8, min_planarity: float = 0.4,
                   normal_bins: int = 8) -> np.ndarray:
    """Detect large planes: planar voxels clustered by quantized
    (normal, offset); each cluster yields one Plane record
    (4 coefficients + 4 corners, MapObjects.h:18-26 layout)."""
    if len(coords) == 0:
        return np.zeros((0, 16))
    import jax.numpy as jnp
    covj = jnp.asarray(cov, jnp.float32)
    n = np.asarray(vx.smallest_eigenvector(covj))
    l1, l2, l3 = (np.asarray(a) for a in vx.eigvals3(covj))
    planarity = (l2 - l3) / np.maximum(l1, 1e-12)
    ok = (planarity > min_planarity) & (count >= min_points)
    if not ok.any():
        return np.zeros((0, 16))
    n = n[ok]
    m = mean[ok]
    # Canonical normal orientation, quantized direction + plane offset.
    flip = (n[:, 2] < 0) | ((n[:, 2] == 0) & (n[:, 0] < 0))
    n = np.where(flip[:, None], -n, n)
    d = -np.sum(n * m, axis=1)
    qn = np.round(n * normal_bins).astype(np.int64)
    qd = np.round(d / (2.0 * voxel_size)).astype(np.int64)
    key = np.concatenate([qn, qd[:, None]], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    planes = []
    for i in range(len(uniq)):
        sel = inv == i
        if sel.sum() < 3:
            continue
        nn = n[sel].mean(0)
        nn /= np.linalg.norm(nn)
        mm = m[sel]
        dd = -float(np.mean(mm @ nn))
        # Corners: bounding box of member voxel means projected in-plane.
        u = np.cross(nn, [0, 0, 1.0])
        if np.linalg.norm(u) < 1e-6:
            u = np.array([1.0, 0, 0])
        u /= np.linalg.norm(u)
        v2 = np.cross(nn, u)
        center = mm.mean(0)
        pu = (mm - center) @ u
        pv = (mm - center) @ v2
        corners = [center + a * u + b * v2
                   for a, b in [(pu.min(), pv.min()), (pu.min(), pv.max()),
                                (pu.max(), pv.max()), (pu.max(), pv.min())]]
        planes.append(np.concatenate([[nn[0], nn[1], nn[2], dd],
                                      np.concatenate(corners)]))
    return np.asarray(planes).reshape(-1, 16)


def extract_landmarks(patch, voxel_size: float) -> Landmarks:
    """Run all extractors over a MapPatchData's voxel statistics."""
    count = patch.count
    denom = np.maximum(count, 1.0)[:, None]
    centers = (patch.coords + 0.5) * voxel_size
    mean_rel = patch.s1 / denom
    mean = mean_rel + centers
    cov = patch.s2 / denom[..., None] \
        - mean_rel[:, :, None] * mean_rel[:, None, :]
    lm = Landmarks.empty()
    lm.posts = extract_posts(patch.coords, count, mean, cov, voxel_size)
    lm.planes = extract_planes(patch.coords, count, mean, cov, voxel_size)
    return lm
