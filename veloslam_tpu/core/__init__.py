from veloslam_tpu.core import se3, geodesy, timeline, timesync  # noqa: F401
