from veloslam_tpu.utils import profiling  # noqa: F401
