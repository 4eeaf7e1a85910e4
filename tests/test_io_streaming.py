import io
import zlib

import numpy as np
import pytest

from tpuzip.io import Lz4FrameReader, Lz4FrameWriter, ZlibReader, ZlibWriter
from tpuzip.oracle import liblz4, lz4 as olz4


def test_lz4_stream_roundtrip(samples):
    for s in samples:
        if len(s) > 70000:
            continue
        sink = io.BytesIO()
        with Lz4FrameWriter(sink, block_max=1 << 16, use_device=False) as w:
            # dribble in odd-sized chunks like a real stream
            for i in range(0, len(s), 1000):
                w.write(s[i : i + 1000])
        frame = sink.getvalue()
        assert olz4.decompress_frame(frame) == s
        out = Lz4FrameReader(io.BytesIO(frame)).read()
        assert out == s


def test_lz4_stream_incremental_read():
    s = b"incremental stream payload " * 500
    sink = io.BytesIO()
    with Lz4FrameWriter(sink, block_max=1 << 16, use_device=False) as w:
        w.write(s)
    r = Lz4FrameReader(io.BytesIO(sink.getvalue()))
    got = bytearray()
    while True:
        piece = r.read(777)
        if not piece:
            break
        got += piece
    assert bytes(got) == s


def test_lz4_stream_checksum_detects_corruption():
    s = b"checksummed " * 300
    sink = io.BytesIO()
    with Lz4FrameWriter(sink, use_device=False) as w:
        w.write(s)
    frame = bytearray(sink.getvalue())
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        Lz4FrameReader(io.BytesIO(bytes(frame))).read()


def test_zlib_stream_accepted_by_stock_zlib(samples):
    for s in samples:
        if len(s) > 70000:
            continue
        sink = io.BytesIO()
        with ZlibWriter(sink, block_size=1 << 14) as w:
            for i in range(0, len(s), 3000):
                w.write(s[i : i + 3000])
        assert zlib.decompress(sink.getvalue()) == s


def test_zlib_stream_reader(samples):
    s = b"nested reader composition " * 400
    sink = io.BytesIO()
    with ZlibWriter(sink) as w:
        w.write(s)
    r = ZlibReader(io.BytesIO(sink.getvalue()))
    assert r.read(100) == s[:100]
    assert r.read() == s[100:]


def test_nested_composition():
    """The reference's idiom: codecs nest over inner streams."""
    s = b"nest me deeply " * 500
    inner = io.BytesIO()
    z = ZlibWriter(inner)
    with Lz4FrameWriter(z, use_device=False) as w:
        w.write(s)
    z.close()
    # unwrap: zlib -> lz4 frame -> plaintext
    lvl1 = zlib.decompress(inner.getvalue())
    assert olz4.decompress_frame(lvl1) == s
