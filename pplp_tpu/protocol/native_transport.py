"""ctypes bindings for the native C++ transport (native/pplp_native.cc).

Drop-in replacement for the Python ``Channel``: same 128-byte ASCII framing,
same byte accounting, native sockets underneath. Built on demand with the
system toolchain; callers fall back to the Python transport when no compiler
is available (``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "load_native", "NativeChannel",
           "native_connect_to_server", "native_connect_to_client",
           "bf_indices_u64", "bf_insert_u64"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libpplp_native.so"
_LIB = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.pplp_connect_server.restype = ctypes.c_int
    lib.pplp_connect_server.argtypes = [ctypes.c_char_p, ctypes.c_uint16, ctypes.c_int]
    lib.pplp_connect_client.restype = ctypes.c_int
    lib.pplp_connect_client.argtypes = [ctypes.c_char_p, ctypes.c_uint16, ctypes.c_int]
    lib.pplp_send_frame.restype = ctypes.c_long
    lib.pplp_send_frame.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64]
    lib.pplp_recv_frame_size.restype = ctypes.c_long
    lib.pplp_recv_frame_size.argtypes = [ctypes.c_int]
    lib.pplp_recv_exact.restype = ctypes.c_long
    lib.pplp_recv_exact.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64]
    lib.pplp_close.argtypes = [ctypes.c_int]
    lib.pplp_bf_indices_u64.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.pplp_bf_insert_u64.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_native() is not None


class NativeChannel:
    """Same interface as protocol.transport.Channel, native underneath."""

    def __init__(self, fd: int):
        self._lib = load_native()
        assert self._lib is not None
        self.fd = fd
        self.bytes_sent = 0
        self.bytes_received = 0

    def send_frame(self, payload: bytes) -> int:
        n = self._lib.pplp_send_frame(self.fd, payload, len(payload))
        if n < 0:
            raise ConnectionError("native send_frame failed")
        self.bytes_sent += 128 + len(payload)
        return len(payload)

    def recv_frame(self) -> bytes:
        length = self._lib.pplp_recv_frame_size(self.fd)
        if length < 0:
            raise ConnectionError("native recv_frame header failed")
        buf = ctypes.create_string_buffer(length)
        if self._lib.pplp_recv_exact(self.fd, buf, length) < 0:
            raise ConnectionError("native recv_frame payload failed")
        self.bytes_received += 128 + length
        return buf.raw

    def close(self):
        self._lib.pplp_close(self.fd)


def native_connect_to_server(ip: str, port: int, ipv6=False) -> NativeChannel:
    lib = load_native()
    fd = lib.pplp_connect_server(ip.encode(), port, int(ipv6))
    if fd < 0:
        raise ConnectionError(f"native connect to {ip}:{port} failed")
    return NativeChannel(fd)


def native_connect_to_client(ip: str, port: int, ipv6=False) -> NativeChannel:
    lib = load_native()
    fd = lib.pplp_connect_client(ip.encode(), port, int(ipv6))
    if fd < 0:
        raise ConnectionError(f"native accept on {ip}:{port} failed")
    return NativeChannel(fd)


def bf_indices_u64(keys: np.ndarray, salts: np.ndarray, table_size: int,
                   mixed: bool) -> np.ndarray:
    """Native AP-hash bit indices: [n_keys, n_salts] uint64."""
    lib = load_native()
    keys = np.ascontiguousarray(keys, np.uint64)
    salts = np.ascontiguousarray(salts, np.uint32)
    out = np.empty((len(keys), len(salts)), np.uint64)
    lib.pplp_bf_indices_u64(
        keys.ctypes.data, len(keys), salts.ctypes.data, len(salts),
        table_size, int(mixed), out.ctypes.data,
    )
    return out


def bf_insert_u64(keys: np.ndarray, salts: np.ndarray, table_size: int,
                  mixed: bool, bit_table: np.ndarray):
    """Native scalar-loop insert into a packed bit table (in place)."""
    lib = load_native()
    keys = np.ascontiguousarray(keys, np.uint64)
    salts = np.ascontiguousarray(salts, np.uint32)
    assert bit_table.dtype == np.uint8 and bit_table.flags.c_contiguous
    lib.pplp_bf_insert_u64(
        keys.ctypes.data, len(keys), salts.ctypes.data, len(salts),
        table_size, int(mixed), bit_table.ctypes.data,
    )
