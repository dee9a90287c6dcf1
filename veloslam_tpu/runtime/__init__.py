from veloslam_tpu.runtime import framestore, pipeline, evaluate  # noqa: F401
