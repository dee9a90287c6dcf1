import jax.numpy as jnp
import numpy as np
import pytest

from veloslam_tpu import constants as C
from veloslam_tpu.core import se3
from veloslam_tpu.core.timeline import PoseTrack
from veloslam_tpu.decode import calibration
from veloslam_tpu.decode.decode import (DeviceCalib, compensate,
                                        decode_packets, frame_break_flags,
                                        parse_packet_fields)
from veloslam_tpu.decode.frames import AssemblyCarry, assemble_frames
from veloslam_tpu.io import packets as pk
from veloslam_tpu.io import simulate as sim


@pytest.fixture(scope="module")
def hdl32_seq():
    return sim.generate_sequence(duration_s=0.5, model="hdl32",
                                 world=sim.World.demo(), seed=3)


def test_parse_packet_fields_matches_numpy_oracle():
    rng = np.random.default_rng(7)
    az = rng.integers(0, 36000, (5, 12))
    dist = rng.integers(0, 60000, (5, 12, 32))
    inten = rng.integers(0, 256, (5, 12, 32))
    gps = rng.integers(0, 3_600_000_000, 5)
    pkts = pk.encode_lidar_packets(az, dist, inten, gps)
    bid, az_j, dist_j, int_j, gps_j = parse_packet_fields(jnp.asarray(pkts))
    oracle = pk.decode_lidar_packets_np(pkts)
    np.testing.assert_array_equal(np.asarray(az_j), oracle["az_ticks"])
    np.testing.assert_array_equal(np.asarray(dist_j), oracle["dist_raw"])
    np.testing.assert_array_equal(np.asarray(int_j), oracle["intensity"])
    np.testing.assert_array_equal(np.asarray(gps_j), oracle["gps_us"])


def _oracle_xyz(az_ticks, dist_raw, calib, az_step, model="hdl32"):
    """Straightforward numpy port of the reference point math
    (HDLParser.cxx:597-623, 945-962) for a (N,12,32) packet batch."""
    dsr = np.arange(32)
    if model == "hdl32":
        frac = dsr * C.HDL32_LASER_US / C.HDL32_FIRING_BLOCK_US
        laser = dsr
    az_pt = az_ticks[..., None] + az_step[:, None, None] * frac
    rot = calib.rot_correction_deg[laser]
    az_rad = np.deg2rad(az_pt / 100.0 - rot)
    d = dist_raw * C.DISTANCE_UNIT_M + calib.dist_correction_m[laser]
    xy = d * np.cos(np.deg2rad(calib.vert_correction_deg))[laser]
    x = xy * np.sin(az_rad) - calib.horiz_offset_m[laser] * np.cos(az_rad)
    y = xy * np.cos(az_rad) + calib.horiz_offset_m[laser] * np.sin(az_rad)
    z = d * np.sin(np.deg2rad(calib.vert_correction_deg))[laser] \
        + calib.vert_offset_m[laser]
    return np.stack([x, y, z], -1)


def test_decode_matches_oracle_with_nonzero_calib():
    rng = np.random.default_rng(11)
    # Calibration with every correction nonzero.
    cal = calibration.LaserCalib(
        rot_correction_deg=rng.normal(0, 2, 32),
        vert_correction_deg=np.linspace(-25, 10, 32),
        dist_correction_m=rng.normal(0, 0.05, 32),
        vert_offset_m=rng.normal(0, 0.1, 32),
        horiz_offset_m=rng.normal(0, 0.03, 32))
    n = 6
    base = rng.integers(0, 30000)
    az = (base + np.arange(n * 12).reshape(n, 12) * 40) % 36000
    dist = rng.integers(100, 60000, (n, 12, 32))
    pkts = pk.encode_lidar_packets(az, dist,
                                   rng.integers(0, 255, (n, 12, 32)),
                                   np.zeros(n))
    dec = decode_packets(jnp.asarray(pkts), DeviceCalib.from_host(cal),
                         model="hdl32")
    want = _oracle_xyz(az.astype(float), dist.astype(float), cal,
                       np.full(n, 40.0))
    np.testing.assert_allclose(np.asarray(dec.xyz), want, atol=5e-4)
    assert bool(np.all(np.asarray(dec.valid)))


def test_decode_invalid_and_crop_masks():
    cal = calibration.hdl32()
    az = np.zeros((1, 12), int)
    dist = np.full((1, 12, 32), 5000)
    dist[0, 0, 0] = 0                      # no-return
    pkts = pk.encode_lidar_packets(az, dist, np.zeros((1, 12, 32)),
                                   np.zeros(1))
    dcal = DeviceCalib.from_host(cal)
    dec = decode_packets(jnp.asarray(pkts), dcal, model="hdl32")
    v = np.asarray(dec.valid)
    assert not v[0, 0, 0] and v[0, 0, 1]
    # crop keep-inside box around origin excludes 10 m returns
    dec2 = decode_packets(jnp.asarray(pkts), dcal, model="hdl32",
                          crop_region=(-1.0, 1.0, -1.0, 1.0, -1.0, 1.0))
    assert int(np.asarray(dec2.valid).sum()) == 0
    # crop_inside drops the inside → everything (at 10 m) survives
    dec3 = decode_packets(jnp.asarray(pkts), dcal, model="hdl32",
                          crop_region=(-1.0, 1.0, -1.0, 1.0, -1.0, 1.0),
                          crop_inside=True)
    assert int(np.asarray(dec3.valid).sum()) == 12 * 32 - 1


def test_laser_selection_mask():
    cal = calibration.hdl32()
    enabled = np.ones(32, bool)
    enabled[5] = False
    az = np.zeros((1, 12), int)
    dist = np.full((1, 12, 32), 5000)
    pkts = pk.encode_lidar_packets(az, dist, np.zeros((1, 12, 32)),
                                   np.zeros(1))
    dec = decode_packets(jnp.asarray(pkts),
                         DeviceCalib.from_host(cal, enabled), model="hdl32")
    v = np.asarray(dec.valid)
    assert not v[:, :, 5].any() and v[:, :, 6].all()


def test_frame_break_flags_sequential_equivalence(hdl32_seq):
    """Parallel wrap detection must equal the reference's sequential
    lastAzimuth scan (HDLParser.cxx:1035-1039)."""
    pkts = hdl32_seq["packets"]
    az = pk.decode_lidar_packets_np(pkts)["az_ticks"].astype(np.int32)
    flags, last = frame_break_flags(jnp.asarray(az), jnp.asarray(-1, jnp.int32))
    flags = np.asarray(flags)
    # sequential oracle
    seq_flags = []
    last_az = -1
    for a in az.reshape(-1):
        seq_flags.append(a < last_az)
        last_az = a
    np.testing.assert_array_equal(flags, np.asarray(seq_flags))
    assert int(last) == az.reshape(-1)[-1]
    # ~10 Hz over 0.5 s → 4-5 frame breaks
    assert 3 <= flags.sum() <= 6


def _decode_and_assemble(seq, batch_pkts=64, compensate_track=None):
    """Helper: run the full decode → (optional compensation) → assembly
    pipeline over a simulated sequence; returns list of completed frames
    (as numpy dicts) in order."""
    model = seq["model"]
    cal = calibration.default_for(model)
    dcal = DeviceCalib.from_host(cal)
    n_beams = cal.n_lasers
    pkts = seq["packets"]
    times = seq["pkt_times_us"]
    carry = AssemblyCarry.init(n_beams)
    open_start_abs = None
    frames_out = []
    n = len(pkts)
    for s in range(0, n - (n % batch_pkts), batch_pkts):
        batch = jnp.asarray(pkts[s:s + batch_pkts])
        anchor_us = times[s]
        rel_s = jnp.asarray((times[s:s + batch_pkts] - anchor_us) * 1e-6,
                            jnp.float32)
        dec = decode_packets(batch, dcal, model=model)
        if compensate_track is not None:
            w = compensate_track.window(int(times[s]),
                                        int(times[s + batch_pkts - 1]),
                                        anchor_us=int(anchor_us))
            xyz_w, _ = compensate(dec, rel_s, jnp.asarray(w["rel_s"]),
                                  jnp.asarray(w["q"]), jnp.asarray(w["t"]),
                                  jnp.asarray(w["v"]))
        else:
            xyz_w = dec.xyz
        carry_start = jnp.asarray(
            0.0 if open_start_abs is None
            else (open_start_abs - anchor_us) * 1e-6, jnp.float32)
        fb, n_done, starts, carry, open_start = assemble_frames(
            dec, xyz_w, rel_s, carry, carry_start, model=model,
            n_beams=n_beams)
        n_done = int(n_done)
        for k in range(n_done):
            frames_out.append({
                "xyz": np.asarray(fb.xyz[k]),
                "mask": np.asarray(fb.mask[k]),
                "rel_s": np.asarray(fb.rel_s[k]),
                "azimuth": np.asarray(fb.azimuth[k]),
                "n_points": int(fb.n_points[k]),
                "start_us": int(anchor_us + float(starts[k]) * 1e6),
            })
        open_start_abs = anchor_us + float(open_start) * 1e6
    return frames_out


def test_assembly_full_revolutions(hdl32_seq):
    frames = _decode_and_assemble(hdl32_seq)
    assert len(frames) >= 3
    for f in frames[1:]:     # first frame is partial (stream starts mid-rev)
        # 2170 firings/rev at 600 rpm for HDL-32 (46.08 µs blocks).
        # Downward beams always hit the ground; upward beams may miss.
        per_beam = f["mask"].sum(axis=1)
        assert per_beam[0] > 2000, per_beam        # lowest beam: full ground
        assert per_beam.max() <= C.MAX_FIRINGS_PER_FRAME
        # azimuth within a beam is strictly increasing over a revolution
        az0 = f["azimuth"][0][f["mask"][0]]
        assert (np.diff(az0) > 0).mean() > 0.99
        # frame-relative times within [0, 0.12 s]
        rel = f["rel_s"][f["mask"]]
        assert rel.min() >= 0.0 and rel.max() < 0.12


def test_assembly_point_conservation(hdl32_seq):
    """Every valid decoded point lands in exactly one frame (or the open
    carry)."""
    seq = hdl32_seq
    cal = calibration.hdl32()
    dec_total = int(np.asarray(decode_packets(
        jnp.asarray(seq["packets"]), DeviceCalib.from_host(cal),
        model="hdl32").valid).sum())
    frames = _decode_and_assemble(seq, batch_pkts=64)
    in_frames = sum(f["n_points"] for f in frames)
    n = len(seq["packets"])
    tail_pkts = n - (n % 64)      # packets actually fed
    dec_fed = int(np.asarray(decode_packets(
        jnp.asarray(seq["packets"][:tail_pkts]),
        DeviceCalib.from_host(cal), model="hdl32").valid).sum())
    assert in_frames <= dec_fed
    # the open frame holds the rest
    assert dec_fed - in_frames < 1302 * 32 * 1.2


def test_decode_compensate_recovers_world_geometry(hdl32_seq):
    """End-to-end accuracy (BASELINE configs[0]): decode + SE(3) motion
    compensation on a moving platform must reproduce the raycast hit points
    in the world frame to centimeter level (quantization: 2 mm distance
    ticks + integer azimuth interpolation)."""
    seq = hdl32_seq
    track = PoseTrack()
    for t_us, p, yaw, v in zip(seq["ins_t_us"], seq["ins_pos"],
                               seq["ins_yaw"], seq["ins_vel"]):
        q = se3.euler_deg_to_quat_np(0.0, 0.0, np.rad2deg(yaw))
        track.add(int(t_us), q=q, t=p, v=v)
    frames = _decode_and_assemble(seq, compensate_track=track)
    f = frames[1]
    pts = f["xyz"][f["mask"]]

    # Ground-truth hit points for the same firings, from the simulator's own
    # raycast: reconstruct via a fresh noise-free resim of frame geometry.
    # Instead of re-raycasting, exploit structure: all ground returns lie on
    # z=0, all post/wall returns are vertical surfaces.  Check the strongest
    # invariant: ground points have z ≈ 0 in the world frame even though the
    # vehicle moved ~0.5 m during the revolution.
    ground = pts[np.abs(pts[:, 2]) < 0.5]
    assert len(ground) > 1000
    assert np.abs(np.median(ground[:, 2])) < 0.02
    assert np.percentile(np.abs(ground[:, 2]), 90) < 0.05


def test_vlp16_and_hdl64_assembly():
    for model in ("vlp16", "hdl64"):
        seq = sim.generate_sequence(duration_s=0.3, model=model,
                                    world=sim.World.demo(1), seed=4)
        frames = _decode_and_assemble(seq, batch_pkts=32)
        assert len(frames) >= 1
        f = frames[-1]
        n_beams = 16 if model == "vlp16" else 64
        assert f["xyz"].shape[0] == n_beams
        assert f["n_points"] > 1000
        occupied_beams = (f["mask"].sum(axis=1) > 0).sum()
        assert occupied_beams > n_beams * 0.6


def test_hdl64_frames_are_beam_sorted():
    """HDL-64 frame rows must read bottom beam -> top beam (the reference
    re-sorts by vertical angle at frame split, HDLParser.cxx:880-893) even
    though the wire order interleaves the upper/lower 32-laser blocks."""
    cal = calibration.hdl64()
    dcal = DeviceCalib.from_host(cal)
    rows = np.asarray(dcal.beam_row)
    # the row permutation sorts vertical angles ascending
    vert_by_row = np.empty(64)
    vert_by_row[rows] = cal.vert_correction_deg
    assert np.all(np.diff(vert_by_row) >= 0)

    # end-to-end: per-row z of a constant-range frame ascends with row
    seq = sim.generate_sequence(duration_s=0.25, model="hdl64",
                                world=sim.World.demo(1), seed=4)
    frames = _decode_and_assemble(seq, batch_pkts=32)
    f = frames[-1]
    # beams pointing further down see the (z=0) ground closer to the
    # sensor; compare median elevation angle per occupied row instead of z
    # (z depends on range).  elevation = asin(z_rel / dist) in the sensor
    # frame; the sim vehicle is at z=2.
    med = np.full(64, np.nan)
    for r in range(64):
        m = f["mask"][r]
        if m.sum() < 50:
            continue
        p = f["xyz"][r][m]
        d = np.linalg.norm(p - [0, 0, 2.0], axis=1)
        med[r] = np.median(np.arcsin(np.clip((p[:, 2] - 2.0) / d, -1, 1)))
    got = med[~np.isnan(med)]
    assert len(got) > 40
    assert (np.diff(got) > -1e-3).mean() > 0.95, got


def test_laser_selection_masks_decode():
    """SensorConfig.laser_mask -> DeviceCalib.laser_enabled drops disabled
    lasers' returns (setLaserSelection parity, HDLParser.h:101-124)."""
    from veloslam_tpu.config import SensorConfig
    sc = SensorConfig(model="hdl32", laser_mask=tuple(range(0, 32, 2)))
    en = sc.enabled_lasers()
    assert en.sum() == 16 and en[0] and not en[1]
    cal = calibration.hdl32()
    dcal = DeviceCalib.from_host(cal, enabled=en)
    seq = sim.generate_sequence(duration_s=0.15, model="hdl32",
                                world=sim.World.demo(1), seed=4)
    dec = decode_packets(jnp.asarray(seq["packets"][:32]), dcal,
                         model="hdl32")
    valid = np.asarray(dec.valid)
    lid = np.asarray(dec.laser_id)
    assert valid[lid % 2 == 1].sum() == 0        # odd lasers all masked
    assert valid[lid % 2 == 0].sum() > 1000      # even lasers still fire
