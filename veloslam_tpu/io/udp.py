"""UDP ingest and replay — the live sensor plane.

Capability parity with the reference's acquisition layer:
  * `UdpReceiver` — async receive into a bounded ring (the reference's
    receiver-thread + SynchronizedQueue, HDLSource.cxx:47-128, 365-506),
    C++-native when the toolchain is available, pure-Python thread
    otherwise;
  * `replay_packets` — paced UDP replay of a packet array
    (vvPacketSender.cxx:82-111 / PacketFileSender.cxx:41-89: 200 µs/packet
    default pacing);
  * `send_struct` — small-struct sender for INS simulation
    (SmallPacketSender.h:61-71).
"""

from __future__ import annotations

import ctypes
import socket
import threading
import time
from collections import deque
from typing import Optional, Tuple

import numpy as np

from veloslam_tpu import constants as C
from veloslam_tpu.io import native

DEFAULT_PACE_US = 200          # reference PacketFileSender.cxx:78


class UdpReceiver:
    """Receive UDP payloads into a bounded ring buffer.

    Default (exact) mode accepts only datagrams of exactly `payload_size`
    bytes (sensor data packets have fixed sizes).  With `variable=True`
    any datagram up to `payload_size` is accepted and `poll_var` reports
    per-datagram lengths — for ports carrying mixed message types (the
    INS port multiplexes InsPVA/RawINS/BestGPSPos, reference
    INSSource.cxx:217-242)."""

    def __init__(self, port: int, payload_size: int, capacity: int = 16384,
                 force_python: bool = False, variable: bool = False):
        self.port = port
        self.payload_size = payload_size
        self.capacity = capacity
        self.variable = variable
        self._native = None if force_python else native.load()
        self._handle = None
        if self._native is not None:
            opener = (self._native.pp_udp_open_any if variable
                      else self._native.pp_udp_open)
            self._handle = opener(port, payload_size, capacity)
            if not self._handle:
                self._native = None
        if self._native is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            # Burst tolerance to match the native receiver (8 MB RCVBUF,
            # packet_pump.cpp): sensor replays arrive in multi-Mbit bursts
            # while the consumer is busy dispatching device work.
            try:
                self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                                      8 * 1024 * 1024)
            except OSError:
                pass
            self._sock.settimeout(0.1)
            self._sock.bind(("0.0.0.0", port))
            self._queue: deque = deque(maxlen=capacity)
            self._stop = threading.Event()
            self._thread = threading.Thread(target=self._rx_loop,
                                            daemon=True)
            self._thread.start()

    def _rx_loop(self):
        while not self._stop.is_set():
            try:
                data, _ = self._sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            ok = (len(data) <= self.payload_size if self.variable
                  else len(data) == self.payload_size)
            if ok and data:
                if len(self._queue) >= self.capacity:
                    self._py_dropped += 1     # deque(maxlen) evicts oldest
                self._queue.append((data, int(time.time() * 1e6)))

    _py_dropped = 0

    @property
    def dropped(self) -> int:
        """Datagrams lost to ring/queue overflow since open (the UDP drop
        counter of the failure-detection story, SURVEY.md §5)."""
        if self._native is not None:
            return int(self._native.pp_udp_dropped(self._handle))
        return self._py_dropped

    def poll(self, max_packets: int = 4096
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Drain up to max_packets; returns ((n, payload) uint8, times µs)."""
        if self._native is not None:
            out = np.empty((max_packets, self.payload_size), np.uint8)
            times = np.empty(max_packets, np.int64)
            n = self._native.pp_udp_poll(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                times.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                max_packets)
            return out[:n], times[:n]
        items = []
        while self._queue and len(items) < max_packets:
            items.append(self._queue.popleft())
        if not items:
            return (np.empty((0, self.payload_size), np.uint8),
                    np.empty(0, np.int64))
        pkts = np.frombuffer(b"".join(d for d, _ in items),
                             np.uint8).reshape(len(items), self.payload_size)
        return pkts, np.asarray([t for _, t in items], np.int64)

    def poll_var(self, max_packets: int = 4096
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Drain up to max_packets from a variable-size receiver; returns
        ((n, payload_size) zero-padded uint8, (n,) int lengths, times µs)."""
        if self._native is not None:
            out = np.empty((max_packets, self.payload_size), np.uint8)
            times = np.empty(max_packets, np.int64)
            lens = np.empty(max_packets, np.int32)
            n = self._native.pp_udp_poll_lens(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                times.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                max_packets)
            return out[:n], lens[:n], times[:n]
        items = []
        while self._queue and len(items) < max_packets:
            items.append(self._queue.popleft())
        pkts = np.zeros((len(items), self.payload_size), np.uint8)
        lens = np.empty(len(items), np.int32)
        for i, (d, _) in enumerate(items):
            pkts[i, :len(d)] = np.frombuffer(d, np.uint8)
            lens[i] = len(d)
        return pkts, lens, np.asarray([t for _, t in items], np.int64)

    def close(self):
        if self._native is not None:
            if self._handle:
                self._native.pp_udp_close(self._handle)
                self._handle = None
        else:
            self._stop.set()
            self._thread.join(timeout=1.0)
            self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def replay_packets(packets: np.ndarray, dest_ip: str = "127.0.0.1",
                   port: int = C.LIDAR_DATA_PORT,
                   pace_us: int = DEFAULT_PACE_US,
                   force_python: bool = False) -> int:
    """Send (n, payload) uint8 packets with fixed pacing; returns n sent."""
    packets = np.ascontiguousarray(packets, np.uint8)
    n, size = packets.shape
    lib = None if force_python else native.load()
    if lib is not None:
        import ctypes
        return int(lib.pp_udp_send(
            dest_ip.encode(), port,
            packets.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n, size, pace_us))
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = 0
    for i in range(n):
        sock.sendto(packets[i].tobytes(), (dest_ip, port))
        sent += 1
        if pace_us:
            time.sleep(pace_us * 1e-6)
    sock.close()
    return sent


def send_struct(payload: bytes, dest_ip: str = "127.0.0.1",
                port: int = C.INS_PORT) -> None:
    """One-shot small-struct sender (SmallPacketSender parity; the
    reference caps at 1200 bytes, SmallPacketSender.h:61-71)."""
    if len(payload) > 1200:
        raise ValueError("payload exceeds 1200 bytes")
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.sendto(payload, (dest_ip, port))
    sock.close()
