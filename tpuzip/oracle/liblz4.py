"""ctypes binding to system liblz4 — cross-validation ground truth for the
LZ4 block format (and the CPU baseline for bench comparisons)."""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def get_lib():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("lz4")
        if name is None:
            raise RuntimeError("liblz4 not found")
        _lib = ctypes.CDLL(name)
        _lib.LZ4_compress_default.restype = ctypes.c_int
        _lib.LZ4_compress_default.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        _lib.LZ4_decompress_safe.restype = ctypes.c_int
        _lib.LZ4_decompress_safe.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        _lib.LZ4_compressBound.restype = ctypes.c_int
        _lib.LZ4_compressBound.argtypes = [ctypes.c_int]
    return _lib


def available() -> bool:
    try:
        get_lib()
        return True
    except (RuntimeError, OSError, AttributeError):
        return False


def compress_block(data: bytes) -> bytes:
    lib = get_lib()
    bound = lib.LZ4_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_default(data, buf, len(data), bound)
    if n <= 0:
        raise RuntimeError("LZ4_compress_default failed")
    return buf.raw[:n]


def decompress_block(data: bytes, out_size: int) -> bytes:
    lib = get_lib()
    buf = ctypes.create_string_buffer(max(out_size, 1))
    n = lib.LZ4_decompress_safe(data, buf, len(data), out_size)
    if n < 0:
        raise RuntimeError(f"LZ4_decompress_safe failed: {n}")
    return buf.raw[:n]
