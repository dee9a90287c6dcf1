"""On-chip A/B of the remaining bulk-batch costs: map update (build_grid
variants), dilated-index build, the selection sort, and association
cadence.  Usage: python scripts/bench_mapupdate.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from veloslam_tpu.utils import compilecache
    compilecache.enable()

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    jax.device_get(jnp.zeros(8))
    print(f"# backend up after {time.perf_counter()-t0:.1f}s", flush=True)

    from veloslam_tpu.registration import voxel as vx

    rng = np.random.default_rng(0)
    P = 96 * 16384
    pts = jnp.asarray(rng.uniform(-80, 80, (P, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random(P) < 0.8)
    origin = jnp.zeros(3, jnp.float32)

    def timed(name, fn, *a, reps=4):
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms",
              flush=True)
        return out

    bg = jax.jit(functools.partial(vx.build_grid, capacity=16384))
    grid = timed("build_grid current (argsort+3 segsums)", bg,
                 pts, mask, origin, 1.0)

    # variant: one (P,16) fused segment_sum
    def build16(pts, mask, origin, voxel_size):
        voxel_size = jnp.asarray(voxel_size, jnp.float32)
        keys = vx.pack_keys(pts, mask, origin, voxel_size, 10)
        order = jnp.argsort(keys)
        sk = keys[order]
        valid = sk != vx.INVALID_KEY
        centers = vx.unpack_keys(sk, origin, voxel_size, 10)
        sp = pts[order] - centers
        new_seg = jnp.concatenate([jnp.ones(1, bool),
                                   sk[1:] != sk[:-1]]) & valid
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        seg_id = jnp.where(valid, jnp.minimum(seg_id, 16384), 16384)
        w = valid.astype(jnp.float32)
        outer = sp[:, :, None] * sp[:, None, :]
        payload = jnp.concatenate(
            [w[:, None], sp * w[:, None],
             outer.reshape(-1, 9) * w[:, None],
             jnp.zeros((P, 3), jnp.float32)], axis=1)        # (P, 16)
        sums = jax.ops.segment_sum(payload, seg_id, num_segments=16385,
                                   indices_are_sorted=True)
        seg_keys = jax.ops.segment_min(
            jnp.where(valid, sk, vx.INVALID_KEY), seg_id,
            num_segments=16385, indices_are_sorted=True)
        return sums[:16384], seg_keys[:16384]
    timed("build_grid fused (P,16) segsum", jax.jit(build16),
          pts, mask, origin, 1.0)

    # variant: sorted cumsum-diff
    def build_cumsum(pts, mask, origin, voxel_size):
        voxel_size = jnp.asarray(voxel_size, jnp.float32)
        keys = vx.pack_keys(pts, mask, origin, voxel_size, 10)
        order = jnp.argsort(keys)
        sk = keys[order]
        valid = sk != vx.INVALID_KEY
        centers = vx.unpack_keys(sk, origin, voxel_size, 10)
        sp = pts[order] - centers
        w = valid.astype(jnp.float32)
        outer = sp[:, :, None] * sp[:, None, :]
        payload = jnp.concatenate(
            [w[:, None], sp * w[:, None],
             outer.reshape(-1, 9) * w[:, None]], axis=1)     # (P, 13)
        pref = jnp.cumsum(payload, axis=0)                   # (P, 13)
        new_seg = jnp.concatenate([jnp.ones(1, bool),
                                   sk[1:] != sk[:-1]]) & valid
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        # boundary rows: first index of each segment
        starts = jnp.zeros(16385, jnp.int32).at[
            jnp.where(new_seg, jnp.minimum(seg_id, 16384), 16384)
        ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")
        ends = jnp.concatenate([starts[1:16385], jnp.asarray([P], jnp.int32)])
        lo = pref[jnp.maximum(starts[:16384] - 1, 0)]
        hi = pref[jnp.minimum(ends[:16384], P) - 1]
        return hi - jnp.where((starts[:16384] > 0)[:, None], lo, 0.0)
    timed("build_grid sorted cumsum-diff", jax.jit(build_cumsum),
          pts, mask, origin, 1.0)

    # merge_stats
    grid2 = bg(pts + 0.5, mask, origin, 1.0)
    timed("merge_stats 16K+16K -> 32K",
          jax.jit(functools.partial(vx.merge_stats, capacity=32768)),
          grid, grid2)

    # dilated index: current vs small int16
    big = jax.jit(functools.partial(vx.build_grid, capacity=32768))(
        pts, mask, origin, 1.0)
    from veloslam_tpu.registration import gicp
    tgt = jax.jit(functools.partial(gicp.plane_grid_from))(big)
    timed("build_dilated_index 256x256x64", jax.jit(
        functools.partial(vx.build_dilated_index)), big, tgt.usable)
    timed("build_dilated_index 192x192x48", jax.jit(
        functools.partial(vx.build_dilated_index, shape=(192, 192, 48))),
        big, tgt.usable)
    timed("plane_grid_from 32K", jax.jit(
        functools.partial(gicp.plane_grid_from)), big)

    # the selection sort at decode scale
    Ncat = (2200 + 16384 * 12) * 32
    key = jnp.asarray(rng.integers(0, 98 << 16, Ncat).astype(np.int32))
    src = jnp.arange(Ncat, dtype=jnp.int32)
    timed(f"selection sort pairs {Ncat/1e6:.1f}M",
          jax.jit(lambda k, s: jax.lax.sort((k, s), num_keys=1)[1][:8]),
          key, src)

    # registration cadence
    from veloslam_tpu.core import se3
    F, Pr = 96, 16384
    fpts = jnp.asarray(
        rng.uniform(-60, 60, (F, Pr, 3)).astype(np.float32))
    fmask = jnp.ones((F, Pr), bool)
    dense = jax.jit(vx.build_dilated_index)(big, tgt.usable)
    priors = se3.Pose(
        jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (F, 1)),
        jnp.zeros((F, 3), jnp.float32))
    for ra in (8, 16):
        timed(f"register_batch 16it ra{ra}", jax.jit(functools.partial(
            gicp.register_batch, iterations=16, reassociate_every=ra)),
            fpts, fmask, tgt, priors, dense)


if __name__ == "__main__":
    main()
