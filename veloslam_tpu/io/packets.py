"""Host-side packet encode/decode helpers and INS log formats (numpy).

Encoders build bit-exact HDL data packets (layout: reference
HDLParser.cxx:67-87) for the simulator, loopback replay tests and the pcap
writer; decoders are the numpy oracle the jitted decoder is validated
against.

INS formats:
  * text log — whitespace rows "T0 T1 R2 R0 R1 v tv_sec tv_usec" with
    angles in radians and the yaw sign flipped on load, exactly the
    reference's loadFromTxtFile contract (TransformManager.cxx:108-118);
  * InsPVA wire struct — the reference receives the raw C struct over UDP
    (type_defs.h:39-58); the natural x86-64 layout is reproduced explicitly
    (little-endian, doubles 8-byte aligned → 4 pad bytes after the two
    uint32s, 4 tail pad bytes: 104 bytes total).
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

from veloslam_tpu import constants as C

# --- HDL data packets --------------------------------------------------------


def encode_lidar_packets(az_ticks: np.ndarray, dist_raw: np.ndarray,
                         intensity: np.ndarray, gps_us: np.ndarray,
                         block_ids: np.ndarray = None) -> np.ndarray:
    """Build (N, 1206) uint8 packets from per-block arrays.

    Args:
      az_ticks: (N, 12) int — azimuth in 0.01° ticks [0, 36000).
      dist_raw: (N, 12, 32) int — distance in 2 mm units (0 = no return).
      intensity: (N, 12, 32) int — 0..255.
      gps_us: (N,) int — µs-into-hour timestamp.
      block_ids: (N, 12) int or None — defaults to 0xeeff everywhere.
    """
    n = az_ticks.shape[0]
    if block_ids is None:
        block_ids = np.full((n, 12), C.BLOCK_ID_0_TO_31, np.uint32)
    pkts = np.zeros((n, C.HDL_PACKET_BYTES), np.uint8)
    blocks = pkts[:, :1200].reshape(n, 12, 100)
    bid = block_ids.astype(np.uint32)
    az = az_ticks.astype(np.uint32)
    blocks[..., 0] = bid & 0xFF
    blocks[..., 1] = (bid >> 8) & 0xFF
    blocks[..., 2] = az & 0xFF
    blocks[..., 3] = (az >> 8) & 0xFF
    rets = blocks[:, :, 4:].reshape(n, 12, 32, 3)
    d = dist_raw.astype(np.uint32)
    rets[..., 0] = d & 0xFF
    rets[..., 1] = (d >> 8) & 0xFF
    rets[..., 2] = np.clip(intensity, 0, 255).astype(np.uint8)
    g = gps_us.astype(np.uint32)
    for i in range(4):
        pkts[:, 1200 + i] = (g >> (8 * i)) & 0xFF
    return pkts


def idle_lidar_packets(template: np.ndarray, n: int) -> np.ndarray:
    """n packets that decode to NOTHING: all returns blanked (distance 0 =
    "no return") and every block azimuth pinned to `template`'s last block
    azimuth (so the azimuth sequence neither advances nor wraps — no frame
    split).  Used to pad a trailing partial batch up to the standard batch
    size so the pre-compiled fixed-shape program is reused instead of
    compiling a new one per partial size."""
    f = decode_lidar_packets_np(template[None])
    az = np.full((n, C.HDL_FIRINGS_PER_PACKET), f["az_ticks"][0, -1],
                 np.uint32)
    zeros = np.zeros((n, C.HDL_FIRINGS_PER_PACKET, C.HDL_LASERS_PER_FIRING),
                     np.uint32)
    gps = np.full(n, f["gps_us"][0], np.uint32)
    return encode_lidar_packets(az, zeros, zeros, gps,
                                np.repeat(f["block_id"][:1], n, axis=0))


def decode_lidar_packets_np(pkts: np.ndarray) -> Dict[str, np.ndarray]:
    """Numpy decode oracle (field extraction only)."""
    n = pkts.shape[0]
    blocks = pkts[:, :1200].reshape(n, 12, 100).astype(np.uint32)
    rets = pkts[:, :1200].reshape(n, 12, 100)[:, :, 4:].reshape(
        n, 12, 32, 3).astype(np.uint32)
    return {
        "block_id": blocks[..., 0] | (blocks[..., 1] << 8),
        "az_ticks": (blocks[..., 2] | (blocks[..., 3] << 8)) % 36000,
        "dist_raw": rets[..., 0] | (rets[..., 1] << 8),
        "intensity": rets[..., 2],
        "gps_us": (pkts[:, 1200].astype(np.uint32)
                   | (pkts[:, 1201].astype(np.uint32) << 8)
                   | (pkts[:, 1202].astype(np.uint32) << 16)
                   | (pkts[:, 1203].astype(np.uint32) << 24)),
    }


# --- INS text log (reference loadFromTxtFile format) -------------------------


def write_ins_txt(path: str, t_us: np.ndarray, pos_xy: np.ndarray,
                  yaw_rad: np.ndarray, roll_rad: np.ndarray = None,
                  pitch_rad: np.ndarray = None,
                  speed: np.ndarray = None) -> None:
    """Write rows "x y yaw roll pitch v sec usec".

    Sign contract: the file stores counter-clockwise yaw; the loader negates
    it (reference TransformManager.cxx:112-114), so we negate here to make
    write→read the identity for our convention.
    """
    n = len(t_us)
    z = np.zeros(n)
    roll = z if roll_rad is None else roll_rad
    pitch = z if pitch_rad is None else pitch_rad
    v = z if speed is None else speed
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{pos_xy[i, 0]:.6f} {pos_xy[i, 1]:.6f} "
                    f"{-yaw_rad[i]:.9f} {roll[i]:.9f} {pitch[i]:.9f} "
                    f"{v[i]:.6f} {t_us[i] // 1_000_000} "
                    f"{t_us[i] % 1_000_000}\n")


def read_ins_txt(path: str) -> Dict[str, np.ndarray]:
    """Read the reference INS text format → dict of arrays.

    Returns times in int64 µs and angles in degrees matching what the
    reference feeds its PoseTransform (rad→deg + yaw negation,
    TransformManager.cxx:110-114).
    """
    raw = np.loadtxt(path, ndmin=2)
    if raw.size == 0:
        raw = raw.reshape(0, 8)
    t_us = (raw[:, 6].astype(np.int64) * 1_000_000
            + raw[:, 7].astype(np.int64))
    return {
        "t_us": t_us,
        "pos_xy": raw[:, 0:2],
        "yaw_deg": -np.rad2deg(raw[:, 2]),
        "roll_deg": np.rad2deg(raw[:, 3]),
        "pitch_deg": np.rad2deg(raw[:, 4]),
        "speed": raw[:, 5],
    }


# --- InsPVA wire struct ------------------------------------------------------

_INSPVA = struct.Struct("<HHII4xd3d3d3di4x")
INSPVA_BYTES = _INSPVA.size  # 104


def pack_inspva(week_number: int, milliseconds: int, week_number_pos: int,
                seconds_pos: float, llh_deg: Tuple[float, float, float],
                vel: Tuple[float, float, float],
                eulr_deg: Tuple[float, float, float],
                ins_status: int = 0) -> bytes:
    return _INSPVA.pack(C.INS_MSG_INSPVA, week_number, milliseconds,
                        week_number_pos, seconds_pos, *llh_deg, *vel,
                        *eulr_deg, ins_status)


def unpack_inspva(data: bytes) -> Dict[str, object]:
    vals = _INSPVA.unpack(data[:INSPVA_BYTES])
    return {
        "message_id": vals[0], "week_number": vals[1],
        "milliseconds": vals[2], "week_number_pos": vals[3],
        "seconds_pos": vals[4], "llh_deg": vals[5:8], "vel": vals[8:11],
        "eulr_deg": vals[11:14], "ins_status": vals[14],
    }


# --- RawINS / BestGPSPos wire structs ----------------------------------------
# Reference type_defs.h:61-79 declares these (ids 325/423) and INSSource
# dispatches on them, but both handler cases are "FIXME: do some useful
# stuffs" stubs (INSSource.cxx:233-238).  Here they are first-class: RawINS
# feeds an IMU sample log / dropout detection, BestGPSPos feeds GPS solution
# health gating (runtime.pipeline).

_RAWINS = struct.Struct("<HHIi3i")
RAWINS_BYTES = _RAWINS.size          # 24

_BESTGPSPOS = struct.Struct("<HHIiif")
BESTGPSPOS_BYTES = _BESTGPSPOS.size  # 20


def pack_rawins(week_number: int, milliseconds: int, imu_status: int,
                accel_raw: Tuple[int, int, int]) -> bytes:
    return _RAWINS.pack(C.INS_MSG_RAWINS, week_number, milliseconds,
                        imu_status, *accel_raw)


def unpack_rawins(data: bytes) -> Dict[str, object]:
    vals = _RAWINS.unpack(data[:RAWINS_BYTES])
    return {
        "message_id": vals[0], "week_number": vals[1],
        "milliseconds": vals[2], "imu_status": vals[3],
        "accel_raw": vals[4:7],
    }


def pack_bestgpspos(week_number: int, milliseconds: int, solution: int,
                    gps_status: int, diff_age: float) -> bytes:
    return _BESTGPSPOS.pack(C.INS_MSG_BESTGPSPOS, week_number, milliseconds,
                            solution, gps_status, diff_age)


def unpack_bestgpspos(data: bytes) -> Dict[str, object]:
    vals = _BESTGPSPOS.unpack(data[:BESTGPSPOS_BYTES])
    return {
        "message_id": vals[0], "week_number": vals[1],
        "milliseconds": vals[2], "solution": vals[3],
        "gps_status": vals[4], "diff_age": vals[5],
    }


def peek_message_id(data: bytes) -> int:
    """Message id of any INS-port datagram (first little-endian uint16)."""
    return int(struct.unpack_from("<H", data)[0]) if len(data) >= 2 else -1
