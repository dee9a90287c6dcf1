from veloslam_tpu.map import voxelmap, landmarks  # noqa: F401
