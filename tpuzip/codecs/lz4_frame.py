"""LZ4 *frame* format backed by the device block codec.

Blocks are encoded batch-parallel on device (codecs.lz4); frame assembly
(magic, FLG/BD descriptor, xxh32 checksums, per-block stored-vs-compressed
choice) is cheap host work.  Frames interoperate with liblz4 and with
tpuzip.oracle.lz4 (reference parity: src/lz4.rs frame reader/writer).
"""

from __future__ import annotations

import struct

import numpy as np

import jax
import jax.numpy as jnp

from tpuzip.codecs import lz4 as jlz4
from tpuzip.core import blocks as blk
from tpuzip.oracle.lz4 import MAGIC, _BD_MAX_SIZES, decompress_frame
from tpuzip.oracle.xxh32 import xxh32


def compress_frame(data: bytes, block_max: int = 1 << 16,
                   content_checksum: bool = True) -> bytes:
    """Device-parallel frame compression (independent blocks)."""
    try:
        from tpuzip.runtime import native

        _xxh = native.xxh32 if native.available() else xxh32
    except Exception:
        _xxh = xxh32
    bd_id = {v: k for k, v in _BD_MAX_SIZES.items()}[block_max]
    blocks, lens = blk.chunk(data, block_max)
    comp, clens = jax.jit(jlz4.encode_batch)(jnp.array(blocks),
                                             jnp.array(lens))
    comp_np = np.asarray(comp)
    clens_np = np.asarray(clens)

    out = bytearray(struct.pack("<I", MAGIC))
    flg = (1 << 6) | (1 << 5) | (int(content_checksum) << 2)
    descriptor = bytes([flg, bd_id << 4])
    out += descriptor + bytes([(_xxh(descriptor) >> 8) & 0xFF])
    for i in range(blocks.shape[0]):
        n = int(lens[i])
        if n == 0:
            continue
        c = int(clens_np[i])
        if c < n:
            out += struct.pack("<I", c) + comp_np[i, :c].tobytes()
        else:  # incompressible: stored block (MSB set), like the reference
            out += struct.pack("<I", n | 0x80000000) + \
                blocks[i, :n].tobytes()
    out += struct.pack("<I", 0)
    if content_checksum:
        out += struct.pack("<I", _xxh(data))
    return bytes(out)


__all__ = ["compress_frame", "decompress_frame"]
