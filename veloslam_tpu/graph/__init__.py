from veloslam_tpu.graph import posegraph, optimize, loopclosure  # noqa: F401
