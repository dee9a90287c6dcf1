"""ctypes binding for the C++ packet pump, compiled on demand.

`load()` returns the shared library handle (building it with g++ on first
use, cached beside the source) or None when no toolchain is available —
callers fall back to the pure-Python io.pcap path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "packet_pump.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_packet_pump.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _configure(lib) -> None:
    import ctypes as ct
    c_ll = ct.c_longlong
    u8p = ct.POINTER(ct.c_ubyte)
    llp = ct.POINTER(c_ll)
    lib.pp_read_packets.restype = c_ll
    lib.pp_read_packets.argtypes = [ct.c_char_p, ct.c_int, u8p, llp, llp,
                                    c_ll]
    lib.pp_count_packets.restype = c_ll
    lib.pp_count_packets.argtypes = [ct.c_char_p, ct.c_int]
    lib.pp_write_pcap.restype = c_ll
    lib.pp_write_pcap.argtypes = [ct.c_char_p, u8p, llp, c_ll, ct.c_int,
                                  ct.c_int]
    lib.pp_udp_open.restype = ct.c_void_p
    lib.pp_udp_open.argtypes = [ct.c_int, ct.c_int, c_ll]
    lib.pp_udp_open_any.restype = ct.c_void_p
    lib.pp_udp_open_any.argtypes = [ct.c_int, ct.c_int, c_ll]
    lib.pp_udp_poll.restype = c_ll
    lib.pp_udp_poll.argtypes = [ct.c_void_p, u8p, llp, c_ll]
    lib.pp_udp_poll_lens.restype = c_ll
    lib.pp_udp_poll_lens.argtypes = [ct.c_void_p, u8p, llp,
                                     ct.POINTER(ct.c_int), c_ll]
    lib.pp_udp_dropped.restype = c_ll
    lib.pp_udp_dropped.argtypes = [ct.c_void_p]
    lib.pp_udp_close.restype = None
    lib.pp_udp_close.argtypes = [ct.c_void_p]
    lib.pp_udp_send.restype = c_ll
    lib.pp_udp_send.argtypes = [ct.c_char_p, ct.c_int, u8p, c_ll, ct.c_int,
                                c_ll]


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                return None
        try:
            _lib = ctypes.CDLL(_SO)
            _configure(_lib)
        except OSError:
            _lib = None
        return _lib
