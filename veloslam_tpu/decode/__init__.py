from veloslam_tpu.decode import calibration, decode, frames  # noqa: F401
