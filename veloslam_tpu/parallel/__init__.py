from veloslam_tpu.parallel import mesh, sharded  # noqa: F401
