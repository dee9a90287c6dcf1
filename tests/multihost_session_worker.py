"""Worker process for the multi-host SLAM SESSION test
(tests/test_multihost.py::test_two_process_slam_session).

Usage: python multihost_session_worker.py <pid> <nprocs> <port> <data_dir>

Runs the FULL pipeline (ingest → globally-assembled ROI → shard_map
registration → owned-tile map update → keyframes/closures) over a
pre-generated simulated drive, with the map tiles partitioned across
processes by dist.tile_owner.  Each process writes its trajectory and
owned-tile list for the parent to check.
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs, port, data_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    from veloslam_tpu.parallel import dist

    dist.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                          num_processes=nprocs, process_id=pid)
    assert dist.process_count() == nprocs

    from veloslam_tpu.config import (PipelineConfig, RegistrationConfig,
                                     SensorConfig, SlamConfig)
    from veloslam_tpu.parallel.session import DistributedSlamSession

    cfg = SlamConfig(
        sensor=SensorConfig(model="hdl32"),
        pipeline=PipelineConfig(packets_per_batch=128),
        registration=RegistrationConfig(max_points=16384,
                                        max_iterations=8))
    sess = DistributedSlamSession(cfg)
    res = sess.run_offline(os.path.join(data_dir, "mh.pcap"),
                           os.path.join(data_dir, "mh_ins.txt"))
    tiles = np.asarray(sess.owned_tiles(), np.int64).reshape(-1, 2)
    np.savez(os.path.join(data_dir, f"session_p{pid}.npz"),
             positions=res["positions"], quaternions=res["quaternions"],
             times_us=res["times_us"],
             registered_fraction=res["registered_fraction"],
             n_keyframes=res["n_keyframes"], tiles=tiles)
    return 0


if __name__ == "__main__":
    sys.exit(main())
