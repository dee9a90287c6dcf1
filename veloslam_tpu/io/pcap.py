"""pcap file read/write without libpcap.

Capability parity with the reference's packet-file layer (reference
vtkPacketFileReader.h:87-197, vtkPacketFileWriter.cxx:41-161) but
implemented directly against the pcap file format (24-byte global header +
16-byte per-record headers) so no native dependency is required; a C++
fast path lives in veloslam_tpu/io/native for bulk ingest.

Reader semantics match the reference: only UDP payloads are yielded and the
42-byte Ethernet/IP/UDP header is stripped (vtkPacketFileReader.h:166-197
hardcodes the same 42-byte strip after a BPF "udp" filter).  The writer
synthesizes the same canned headers for 1206-byte LiDAR and 512-byte
position packets (vtkPacketFileWriter.cxx:41-54: UDP ports 2368 / 8308).

Random access uses (record_offset, ...) byte offsets in place of the
reference's fpos_t arithmetic (vtkPacketFileReader.h:55-66).
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from veloslam_tpu import constants as C

PCAP_MAGIC_US = 0xA1B2C3D4
PCAP_MAGIC_NS = 0xA1B23C4D
GLOBAL_HEADER = struct.Struct("<IHHiIII")
RECORD_HEADER = struct.Struct("<IIII")
LINKTYPE_ETHERNET = 1

ETH_IP_UDP_HEADER_LEN = 42


def _udp_header(payload_len: int, dport: int) -> bytes:
    """Synthesize a 42-byte Ethernet+IPv4+UDP header (same scheme as the
    reference's canned LidarPacketHeader/PositionPacketHeader,
    vtkPacketFileWriter.cxx:41-54)."""
    eth = (b"\xff\xff\xff\xff\xff\xff"      # dst mac (broadcast)
           b"\x60\x76\x88\x00\x00\x00"      # src mac
           b"\x08\x00")                     # ethertype IPv4
    total_len = 20 + 8 + payload_len
    ip = struct.pack(">BBHHHBBH4s4s",
                     0x45, 0, total_len, 0x04D2, 0x4000, 0xFF, 17, 0,
                     bytes([192, 168, 1, 201]), bytes([255, 255, 255, 255]))
    # Header checksum left zero (parsers here don't validate it).
    udp = struct.pack(">HHHH", dport, dport, 8 + payload_len, 0)
    return eth + ip + udp


class PcapWriter:
    """Write UDP payloads into a pcap file."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(GLOBAL_HEADER.pack(PCAP_MAGIC_US, 2, 4, 0, 0, 65535,
                                         LINKTYPE_ETHERNET))

    def write(self, payload: bytes, t_us: int,
              dport: Optional[int] = None) -> None:
        if dport is None:
            dport = (C.LIDAR_DATA_PORT if len(payload) == C.HDL_PACKET_BYTES
                     else C.LIDAR_POSITION_PORT)
        pkt = _udp_header(len(payload), dport) + payload
        self._f.write(RECORD_HEADER.pack(t_us // 1_000_000, t_us % 1_000_000,
                                         len(pkt), len(pkt)))
        self._f.write(pkt)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PcapReader:
    """Iterate (payload bytes, time µs, record byte offset) over a pcap."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        hdr = self._f.read(GLOBAL_HEADER.size)
        if len(hdr) < GLOBAL_HEADER.size:
            raise ValueError(f"{path}: truncated pcap global header")
        magic = struct.unpack("<I", hdr[:4])[0]
        if magic == PCAP_MAGIC_US:
            self._t_scale = 1
        elif magic == PCAP_MAGIC_NS:
            self._t_scale = 1000
        else:
            raise ValueError(f"{path}: bad pcap magic {magic:#x}")
        self.linktype = GLOBAL_HEADER.unpack(hdr)[6]

    def seek(self, offset: int) -> None:
        self._f.seek(offset)

    def tell(self) -> int:
        return self._f.tell()

    def __iter__(self) -> Iterator[Tuple[bytes, int, int]]:
        return self

    def __next__(self) -> Tuple[bytes, int, int]:
        while True:
            offset = self._f.tell()
            hdr = self._f.read(RECORD_HEADER.size)
            if len(hdr) < RECORD_HEADER.size:
                raise StopIteration
            sec, frac, incl, _ = RECORD_HEADER.unpack(hdr)
            data = self._f.read(incl)
            if len(data) < incl:
                raise StopIteration
            t_us = sec * 1_000_000 + (frac // self._t_scale
                                      if self._t_scale > 1 else frac)
            # Strip the link/IP/UDP framing, mirroring the reference's
            # 42-byte strip (vtkPacketFileReader.h:187-195); non-UDP records
            # are skipped.
            if incl > ETH_IP_UDP_HEADER_LEN and data[23:24] == b"\x11":
                return data[ETH_IP_UDP_HEADER_LEN:], t_us, offset

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_lidar_packets(path: str, max_packets: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bulk-load all 1206-byte LiDAR payloads from a pcap.

    Returns (packets (N, 1206) uint8, times_us (N,) int64,
    offsets (N,) int64 — record byte offsets for random re-reads, the
    analog of the reference's frame (fpos, skip) index,
    HDLParser.cxx:1065-1160).

    Uses the C++ packet pump when available; falls back to the Python
    record parser.
    """
    from veloslam_tpu.io import native
    lib = native.load()
    if lib is not None:
        import ctypes
        cap = lib.pp_count_packets(path.encode(), C.HDL_PACKET_BYTES)
        if cap < 0:
            raise ValueError(f"{path}: unreadable pcap")
        if max_packets is not None:
            cap = min(cap, max_packets)
        out = np.empty((cap, C.HDL_PACKET_BYTES), np.uint8)
        times = np.empty(cap, np.int64)
        offs = np.empty(cap, np.int64)
        n = lib.pp_read_packets(
            path.encode(), C.HDL_PACKET_BYTES,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            times.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), cap)
        if n >= 0:
            return out[:n], times[:n], offs[:n]
    pkts: List[bytes] = []
    times: List[int] = []
    offsets: List[int] = []
    with PcapReader(path) as r:
        for payload, t_us, off in r:
            if len(payload) != C.HDL_PACKET_BYTES:
                continue
            pkts.append(payload)
            times.append(t_us)
            offsets.append(off)
            if max_packets is not None and len(pkts) >= max_packets:
                break
    if not pkts:
        return (np.zeros((0, C.HDL_PACKET_BYTES), np.uint8),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    arr = np.frombuffer(b"".join(pkts), np.uint8).reshape(
        len(pkts), C.HDL_PACKET_BYTES)
    return arr, np.asarray(times, np.int64), np.asarray(offsets, np.int64)


def read_position_packets(path: str, max_packets: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Bulk-load all 512-byte position-packet payloads from a pcap.

    Returns (packets (N, 512) uint8, times_us (N,) int64).  The reference
    receives these on port 8308 but drops them at its length-1206 gate
    (HDLSource.cxx:211); here they ground the HDL clock to GPS UTC
    (io.packets.unpack_position_packet, core.timesync.HdlClock.ground).
    """
    pkts, times = [], []
    with PcapReader(path) as r:
        for payload, t_us, _ in r:
            if len(payload) == C.POSITION_PACKET_BYTES:
                pkts.append(np.frombuffer(payload, np.uint8))
                times.append(t_us)
                if max_packets is not None and len(pkts) >= max_packets:
                    break
    if not pkts:
        return (np.empty((0, C.POSITION_PACKET_BYTES), np.uint8),
                np.empty(0, np.int64))
    return np.stack(pkts), np.asarray(times, np.int64)
