"""Worker process for tests/test_multihost.py.

Usage: python multihost_worker.py <pid> <nprocs> <port> <out_dir>

Each process owns the map voxels whose tile hashes to it
(parallel.dist.tile_owner), pads its rows to the common shard capacity,
assembles the globally-sharded PlaneGrid, and runs the SAME shard_map
registration kernel used single-chip (parallel.sharded.register_sharded).
Process 0 writes the result for the parent to compare against a
single-process oracle.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    from veloslam_tpu.parallel import dist

    dist.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                          num_processes=nprocs, process_id=pid)
    assert dist.process_count() == nprocs

    import jax.numpy as jnp

    from veloslam_tpu.core import se3
    from veloslam_tpu.parallel import sharded
    from veloslam_tpu.registration import gicp
    from veloslam_tpu.registration import voxel as vx

    # Deterministic fixture (identical in parent oracle): three orthogonal
    # plane families so all six DoF are observable under point-to-plane.
    rng = np.random.default_rng(7)
    pts = []
    for _ in range(48):                       # ground patches
        c = rng.uniform(-40, 40, 2)
        u = rng.uniform(-1.5, 1.5, (48, 2))
        pts.append(np.stack([c[0] + u[:, 0], c[1] + u[:, 1],
                             np.zeros(48)], -1))
    for _ in range(24):                       # walls facing x
        c = rng.uniform(-40, 40, 2)
        u = rng.uniform(-1.5, 1.5, (48, 2))
        pts.append(np.stack([np.full(48, c[0]), c[1] + u[:, 0],
                             2.0 + u[:, 1]], -1))
    for _ in range(24):                       # walls facing y
        c = rng.uniform(-40, 40, 2)
        u = rng.uniform(-1.5, 1.5, (48, 2))
        pts.append(np.stack([c[0] + u[:, 0], np.full(48, c[1]),
                             2.0 + u[:, 1]], -1))
    pts = np.concatenate(pts).astype(np.float32)
    mask_h = np.ones(len(pts), bool)

    CAP = 4096
    full = gicp.build_plane_grid(jnp.asarray(pts), jnp.asarray(mask_h),
                                 np.zeros(3), 1.0, capacity=CAP)

    # Partition rows by the OWNING TILE's hash — each host keeps only its
    # voxels, pads to the common per-shard capacity.
    local_rows, origin, voxel_size = dist.partition_plane_grid_rows(
        full, pid, nprocs, tile_m=16.0)
    mesh = dist.global_mesh(data_axis=1)
    target = dist.assemble_global_plane_grid(mesh, local_rows, origin,
                                             voxel_size)

    # Perturbed scan registers back onto the map.
    true_pose = se3.Pose(
        jnp.asarray(se3.euler_deg_to_quat_np(0.0, 0.0, 2.0)),
        jnp.asarray([0.3, -0.2, 0.05], jnp.float32))
    moved = np.asarray(se3.apply(se3.inverse(true_pose), jnp.asarray(pts)))
    g_pts = dist.replicate(mesh, [moved.astype(np.float32)])[0]
    g_mask = dist.replicate(mesh, [mask_h])[0]

    res = sharded.register_sharded(mesh, g_pts, g_mask, target,
                                   se3.Pose.identity(), iterations=12)
    q, t, n = dist.allgather([res.pose.q, res.pose.t, res.n_matched])
    if pid == 0:
        np.savez(f"{out_dir}/result.npz", q=q, t=t, n_matched=n,
                 true_q=np.asarray(true_pose.q), true_t=np.asarray(true_pose.t))
    print(f"[worker {pid}] done n_matched={n}", flush=True)


if __name__ == "__main__":
    main()
