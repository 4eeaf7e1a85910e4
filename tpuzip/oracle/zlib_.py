"""zlib container (RFC 1950) around DEFLATE.

Reference parity: rust-compress ``src/zlib.rs`` (CMF/FLG parse with CM=8,
FCHECK mod-31 validation, FDICT unsupported, trailing big-endian Adler-32
verified via the checksum module).  Upstream is decode-only; ``compress``
here pairs with our deflate encoder.  Validated against stdlib ``zlib``.
"""

from __future__ import annotations

import struct

from tpuzip.oracle import deflate
from tpuzip.oracle.adler import adler32


def compress(data: bytes, mode: str = "dynamic", max_chain: int = 128) -> bytes:
    cmf = 0x78  # CM=8 (deflate), CINFO=7 (32K window)
    flg = 0
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    body = deflate.compress(data, mode=mode, max_chain=max_chain)
    return bytes([cmf, flg]) + body + struct.pack(">I", adler32(data))


def decompress(data: bytes) -> bytes:
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("unsupported compression method (CM != 8)")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib header FCHECK failed")
    if flg & 0x20:
        raise ValueError("FDICT preset dictionaries unsupported")
    out, consumed = deflate.decompress_ex(data[2:])
    tail = data[2 + consumed : 2 + consumed + 4]
    if len(tail) < 4:
        raise ValueError("truncated zlib stream (missing Adler-32)")
    (expect,) = struct.unpack(">I", tail)
    actual = adler32(out)
    if expect != actual:
        raise ValueError(f"Adler-32 mismatch: {expect:#x} != {actual:#x}")
    return out
