"""Fault-injection tests: the decoder and pipeline must degrade
gracefully on malformed input (the reference's failure handling is a
packet-length gate and little else, SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from veloslam_tpu import constants as C
from veloslam_tpu.decode import calibration
from veloslam_tpu.decode.decode import DeviceCalib, decode_packets
from veloslam_tpu.decode.frames import AssemblyCarry, assemble_frames
from veloslam_tpu.io.pcap import PcapWriter, read_lidar_packets


def test_decode_random_garbage_is_finite():
    rng = np.random.default_rng(0)
    pkts = rng.integers(0, 256, (16, C.HDL_PACKET_BYTES)).astype(np.uint8)
    dec = decode_packets(jnp.asarray(pkts),
                         DeviceCalib.from_host(calibration.hdl32()),
                         model="hdl32")
    assert np.all(np.isfinite(np.asarray(dec.xyz)))
    assert np.all(np.isfinite(np.asarray(dec.dist_m)))
    az = np.asarray(dec.az_ticks)
    assert az.min() >= 0 and az.max() < 36000


def test_assembly_garbage_does_not_crash():
    rng = np.random.default_rng(1)
    pkts = rng.integers(0, 256, (32, C.HDL_PACKET_BYTES)).astype(np.uint8)
    dec = decode_packets(jnp.asarray(pkts),
                         DeviceCalib.from_host(calibration.hdl32()),
                         model="hdl32")
    carry = AssemblyCarry.init(32)
    rel = jnp.asarray(np.arange(32) * 5.5e-4, jnp.float32)
    fb, n_done, starts, carry, open_start = assemble_frames(
        dec, dec.xyz, rel, carry, jnp.asarray(0.0, jnp.float32),
        model="hdl32", n_beams=32)
    # garbage azimuths produce many tiny frames; slot budget must cap them
    assert 0 <= int(n_done) <= 8
    assert np.all(np.isfinite(np.asarray(fb.xyz)))


def test_truncated_pcap(tmp_path):
    path = str(tmp_path / "t.pcap")
    with PcapWriter(path) as w:
        for i in range(5):
            w.write(bytes([i]) * C.HDL_PACKET_BYTES, 1000 + i)
    # chop the file mid-record
    data = open(path, "rb").read()
    open(path, "wb").write(data[:len(data) - 700])
    pkts, times, _ = read_lidar_packets(path)
    assert len(pkts) == 4          # the truncated record is dropped


def test_empty_pcap(tmp_path):
    path = str(tmp_path / "e.pcap")
    PcapWriter(path).close()
    pkts, times, offs = read_lidar_packets(path)
    assert len(pkts) == 0


def test_mixed_payload_sizes_ignored(tmp_path):
    path = str(tmp_path / "m.pcap")
    with PcapWriter(path) as w:
        w.write(b"\x01" * C.HDL_PACKET_BYTES, 1)
        w.write(b"\x02" * 300, 2, dport=9999)     # junk-size payload
        w.write(b"\x03" * C.HDL_PACKET_BYTES, 3)
    pkts, times, _ = read_lidar_packets(path)
    assert len(pkts) == 2


def test_registration_empty_scan_is_safe():
    from veloslam_tpu.core import se3
    from veloslam_tpu.registration import gicp
    P = 1024
    pts = jnp.zeros((P, 3), jnp.float32)
    mask = jnp.zeros(P, bool)
    tgt = jnp.asarray(np.random.default_rng(0).normal(0, 5, (P, 3)),
                      jnp.float32)
    grid = gicp.build_plane_grid(tgt, jnp.ones(P, bool), np.zeros(3), 1.0,
                                 capacity=1024)
    res = gicp.register(pts, mask, grid, se3.Pose.identity(), iterations=4)
    # no correspondences → pose unchanged, no NaNs
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0, atol=1e-6)
    assert int(res.n_matched) == 0
    assert np.all(np.isfinite(np.asarray(res.pose.q)))
