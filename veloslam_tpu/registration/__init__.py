from veloslam_tpu.registration import voxel, gicp, ndt  # noqa: F401
