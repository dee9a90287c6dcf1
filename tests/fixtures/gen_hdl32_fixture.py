"""Generate the independent HDL-32E golden fixture (hdl32_indep.pcap +
hdl32_indep_golden.npz).

INDEPENDENCE CONTRACT: this generator shares NO code with the engine.
Every byte is laid out here with struct.pack straight from the public
specifications — the pcap file format (libpcap global + record headers),
Ethernet/IPv4/UDP framing, and the Velodyne HDL-32E data-packet format
(12 × 100-byte firing blocks [0xEEFF, u16 azimuth in 0.01°, 32 ×
(u16 distance in 2 mm, u8 intensity)], u32 GPS µs-into-hour, 2 status
bytes, all little-endian) — and the golden point cloud is computed with
closed-form numpy from the datasheet geometry (x = d·cosω·sinα,
y = d·cosω·cosα, z = d·sinω; per-laser azimuth interpolated at the
HDL-32E timing of 1.152 µs/laser within a 46.08 µs block).  The vertical
angle table is re-typed from the datasheet, NOT imported from the
engine's calibration module.

Round-2 verdict: every decode-accuracy test consumed simulator-produced
pcaps, and the simulator and decoder share packet-format code paths, so
a wrong constant could cancel out.  No real captured pcap can be added
in this zero-egress environment; this generator breaks the circularity
instead — the fixture bytes and expectations derive from the published
format alone.  (Reference developed against recorded data,
SimpleHDLTester.cxx:13-29.)

Run from the repo root:  python tests/fixtures/gen_hdl32_fixture.py
The committed fixture is deterministic (fixed seed); regenerating must
be byte-identical.
"""

import os
import struct

import numpy as np

# --- HDL-32E datasheet constants (re-typed, not imported) -------------------
VERT_DEG = np.array([
    -30.67, -9.33, -29.33, -8.00, -28.00, -6.66, -26.66, -5.33,
    -25.33, -4.00, -24.00, -2.67, -22.67, -1.33, -21.33, 0.00,
    -20.00, 1.33, -18.67, 2.67, -17.33, 4.00, -16.00, 5.33,
    -14.67, 6.67, -13.33, 8.00, -12.00, 9.33, -10.67, 10.67,
])
BLOCK_US = 46.08          # one 32-laser firing block
LASER_US = 1.152          # per-laser firing offset within the block
DIST_UNIT_M = 0.002       # 2 mm distance counts
BLOCK_FLAG = 0xEEFF       # HDL-32 block id ("upper" bank flag)
N_BLOCKS = 12
N_LASERS = 32
LIDAR_PORT = 2368


def lidar_payload(azimuths_cdeg, dist_counts, intensities, gps_us):
    """One 1206-byte HDL-32 payload from explicit field values."""
    assert len(azimuths_cdeg) == N_BLOCKS
    out = bytearray()
    for b in range(N_BLOCKS):
        out += struct.pack("<HH", BLOCK_FLAG, int(azimuths_cdeg[b]))
        for j in range(N_LASERS):
            out += struct.pack("<HB", int(dist_counts[b, j]),
                               int(intensities[b, j]))
    out += struct.pack("<I", int(gps_us))
    out += bytes([0x37, 0x21])        # return mode / sensor model status
    assert len(out) == 1206
    return bytes(out)


def eth_ip_udp(payload_len, dport):
    eth = (b"\x01\x02\x03\x04\x05\x06" b"\x11\x12\x13\x14\x15\x16"
           b"\x08\x00")
    ip = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + 8 + payload_len,
                     0x1234, 0, 64, 17, 0,
                     bytes([10, 0, 0, 7]), bytes([10, 0, 0, 255]))
    udp = struct.pack(">HHHH", dport, dport, 8 + payload_len, 0)
    return eth + ip + udp


def write_pcap(path, records):
    """records: [(payload bytes, t_us, dport)] — libpcap format from the
    published spec: <IHHiIII global header, <IIII per-record header."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1))
        for payload, t_us, dport in records:
            frame = eth_ip_udp(len(payload), dport) + payload
            f.write(struct.pack("<IIII", t_us // 1_000_000,
                                t_us % 1_000_000, len(frame), len(frame)))
            f.write(frame)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    rng = np.random.default_rng(20260820)

    n_pkts = 8
    az_step_cdeg = 36       # 0.36° per block → 20 Hz-ish spin, arbitrary
    az0 = 35800             # starts just below the wrap: packet 0 block 5
    #                         crosses 36000 → frame boundary exercised
    t0_us = 1_700_000_123_456

    payloads = []
    golden_az = np.zeros((n_pkts, N_BLOCKS), np.int32)
    golden_dist = np.zeros((n_pkts, N_BLOCKS, N_LASERS), np.int64)
    golden_int = np.zeros((n_pkts, N_BLOCKS, N_LASERS), np.uint8)
    golden_gps = np.zeros(n_pkts, np.int64)
    times_us = np.zeros(n_pkts, np.int64)
    for p in range(n_pkts):
        az = (az0 + az_step_cdeg * (np.arange(N_BLOCKS) + p * N_BLOCKS)) \
            % 36000
        dist = rng.integers(500, 30000, (N_BLOCKS, N_LASERS))
        # sprinkle no-return slots (distance 0 → invalid point)
        zero = rng.random((N_BLOCKS, N_LASERS)) < 0.15
        dist[zero] = 0
        inten = rng.integers(0, 256, (N_BLOCKS, N_LASERS))
        gps = 1_234_567 + int(p * N_BLOCKS * BLOCK_US)
        payloads.append(lidar_payload(az, dist, inten, gps))
        golden_az[p] = az
        golden_dist[p] = dist
        golden_int[p] = inten
        golden_gps[p] = gps
        times_us[p] = t0_us + int(p * N_BLOCKS * BLOCK_US)

    write_pcap(os.path.join(here, "hdl32_indep.pcap"),
               [(pl, int(t), LIDAR_PORT)
                for pl, t in zip(payloads, times_us)])

    # Closed-form golden geometry (float64 then cast):
    # interpolated azimuth of laser j in block b uses the sensor's
    # constant azimuth rate over the block (datasheet timing).
    frac = (np.arange(N_LASERS) * LASER_US) / BLOCK_US           # (32,)
    az_interp = golden_az[..., None] + az_step_cdeg * frac[None, None, :]
    alpha = np.deg2rad(az_interp / 100.0)
    omega = np.deg2rad(VERT_DEG)[None, None, :]
    d = golden_dist * DIST_UNIT_M
    x = d * np.cos(omega) * np.sin(alpha)
    y = d * np.cos(omega) * np.cos(alpha)
    z = d * np.sin(omega)
    xyz = np.stack([x, y, z], -1).astype(np.float32)
    valid = golden_dist != 0

    np.savez(os.path.join(here, "hdl32_indep_golden.npz"),
             az_ticks=golden_az, dist_counts=golden_dist,
             intensity=golden_int, gps_us=golden_gps,
             times_us=times_us, xyz=xyz, valid=valid,
             az_step_cdeg=np.int64(az_step_cdeg))
    print("wrote hdl32_indep.pcap +", xyz.shape, "golden points")


if __name__ == "__main__":
    main()
