import numpy as np
import pytest

from veloslam_tpu import constants as C
from veloslam_tpu.io import packets as pk
from veloslam_tpu.io.pcap import PcapReader, PcapWriter, read_lidar_packets


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    n = 7
    az = rng.integers(0, 36000, (n, 12))
    dist = rng.integers(0, 60000, (n, 12, 32))
    inten = rng.integers(0, 256, (n, 12, 32))
    gps = rng.integers(0, 3_600_000_000, n)
    pkts = pk.encode_lidar_packets(az, dist, inten, gps)
    dec = pk.decode_lidar_packets_np(pkts)
    np.testing.assert_array_equal(dec["az_ticks"], az)
    np.testing.assert_array_equal(dec["dist_raw"], dist)
    np.testing.assert_array_equal(dec["intensity"], inten)
    np.testing.assert_array_equal(dec["gps_us"], gps)
    np.testing.assert_array_equal(dec["block_id"],
                                  np.full((n, 12), C.BLOCK_ID_0_TO_31))


def test_pcap_roundtrip(tmp_path):
    path = str(tmp_path / "t.pcap")
    payloads = [bytes([i]) * C.HDL_PACKET_BYTES for i in range(5)]
    times = [1_700_000_000_000_000 + i * 100 for i in range(5)]
    with PcapWriter(path) as w:
        for p, t in zip(payloads, times):
            w.write(p, t)
    got = list(PcapReader(path))
    assert len(got) == 5
    for (pl, t, off), want_pl, want_t in zip(got, payloads, times):
        assert pl == want_pl
        assert t == want_t
    # random access via record offset
    with PcapReader(path) as r:
        r.seek(got[3][2])
        pl, t, _ = next(r)
        assert pl == payloads[3] and t == times[3]


def test_read_lidar_packets_filters_position_packets(tmp_path):
    path = str(tmp_path / "t.pcap")
    with PcapWriter(path) as w:
        w.write(b"\x01" * C.HDL_PACKET_BYTES, 10)
        w.write(b"\x02" * C.POSITION_PACKET_BYTES, 20)   # position packet
        w.write(b"\x03" * C.HDL_PACKET_BYTES, 30)
    arr, times, offsets = read_lidar_packets(path)
    assert arr.shape == (2, C.HDL_PACKET_BYTES)
    assert times.tolist() == [10, 30]


def test_ins_txt_roundtrip(tmp_path):
    path = str(tmp_path / "ins.txt")
    n = 9
    t_us = np.arange(n, dtype=np.int64) * 10_000 + 1_700_000_000_123_456
    pos = np.random.default_rng(0).normal(size=(n, 2)) * 100
    yaw = np.linspace(-3, 3, n)
    pk.write_ins_txt(path, t_us, pos, yaw)
    out = pk.read_ins_txt(path)
    np.testing.assert_array_equal(out["t_us"], t_us)
    np.testing.assert_allclose(out["pos_xy"], pos, atol=1e-5)
    np.testing.assert_allclose(np.deg2rad(out["yaw_deg"]), yaw, atol=1e-8)


def test_inspva_roundtrip():
    data = pk.pack_inspva(2380, 123456, 2380, 123.456789,
                          (31.0, 121.5, 18.9), (1.0, 2.0, 3.0),
                          (0.1, 0.2, 0.3), 42)
    assert len(data) == pk.INSPVA_BYTES
    out = pk.unpack_inspva(data)
    assert out["message_id"] == C.INS_MSG_INSPVA
    assert out["week_number"] == 2380
    np.testing.assert_allclose(out["llh_deg"], (31.0, 121.5, 18.9))
    np.testing.assert_allclose(out["seconds_pos"], 123.456789)
    assert out["ins_status"] == 42


def test_idle_lidar_packets_decode_to_nothing():
    """Idle pad packets must add no points and no frame splits."""
    import numpy as np

    from veloslam_tpu.io import packets as pk

    rng = np.random.default_rng(3)
    az = (np.arange(12, dtype=np.uint32) * 18 + 30000).reshape(1, 12)
    dist = rng.integers(500, 4000, (1, 12, 32)).astype(np.uint32)
    inten = rng.integers(0, 255, (1, 12, 32)).astype(np.uint32)
    tmpl = pk.encode_lidar_packets(az, dist, inten,
                                   np.asarray([1234567], np.uint32))
    idle = pk.idle_lidar_packets(tmpl[0], 5)
    assert idle.shape == tmpl[0][None].repeat(5, 0).shape
    f = pk.decode_lidar_packets_np(idle)
    assert (f["dist_raw"] == 0).all()                 # no returns
    assert (f["az_ticks"] == az[0, -1]).all()         # frozen azimuth
    assert (f["gps_us"] == 1234567).all()


def test_position_packet_roundtrip(tmp_path):
    """write_sequence -> read_position_packets -> parse_gprmc recovers the
    sim origin in degrees (regression: a deg/rad double-unit bug once put
    0.42S 1.62E in every simulated pcap)."""
    from veloslam_tpu.io import simulate as sim
    seq = sim.generate_sequence(duration_s=0.3, model="hdl32", seed=3)
    paths = sim.write_sequence(seq, str(tmp_path), name="pp",
                               position_packet_period_s=0.1)
    from veloslam_tpu.io.pcap import read_position_packets
    pkts, times = read_position_packets(paths["pcap"])
    assert len(pkts) >= 2
    for raw in pkts:
        info = pk.unpack_position_packet(raw.tobytes())
        assert info["rmc"] is not None
        # the sim drives within ~100 m of the origin: < 0.01 deg
        assert abs(info["rmc"]["lat_deg"] - sim.SIM_ORIGIN_LLH[0]) < 0.01
        assert abs(info["rmc"]["lon_deg"] - sim.SIM_ORIGIN_LLH[1]) < 0.01
        assert info["pps_status_str"] == "locked"


def test_gprmc_pack_parse_roundtrip():
    utc_us = 1_700_000_123_456_789
    s = pk.make_gprmc(utc_us, 31.23456, 121.65432, speed_knots=12.3)
    got = pk.parse_gprmc(s)
    assert got["valid"]
    assert abs(got["lat_deg"] - 31.23456) < 1e-5
    assert abs(got["lon_deg"] - 121.65432) < 1e-5
    # GPRMC carries hundredths of a second
    assert abs(got["utc_us"] - utc_us) < 20_000


def test_position_packet_codec_roundtrip():
    raw = pk.pack_position_packet(123_456_789, 1_700_000_000_000_000,
                                  31.0, 121.0, pps_status=2)
    info = pk.unpack_position_packet(raw)
    assert info["us_into_hour"] == 123_456_789
    assert info["pps_status"] == 2
    assert info["rmc"]["lat_deg"] == pytest.approx(31.0, abs=1e-5)
    assert info["rmc"]["lon_deg"] == pytest.approx(121.0, abs=1e-5)


def test_hdlclock_ground_and_wrap():
    from veloslam_tpu.core.timesync import HOUR_US, HdlClock
    clock = HdlClock()
    # ungrounded: resolves against the ref time
    t1 = clock.resolve(1_000_000, ref_time_us=1_700_000_001_000_000)
    assert t1 == 1_700_000_001_000_000
    # grounding pins the hour base to GPS truth
    corr = clock.ground(2_000_000, 1_700_000_002_500_000)
    assert corr == 500_000
    assert clock.resolve(3_000_000) == 1_700_000_003_500_000
    # counter wrap after grounding advances the hour base
    t_wrapped = clock.resolve(100)
    assert t_wrapped == 1_700_000_000_500_000 + HOUR_US + 100
