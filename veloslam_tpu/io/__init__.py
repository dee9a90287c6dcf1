from veloslam_tpu.io import pcap, packets, simulate  # noqa: F401
