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


# ---------------------------------------------------------------------------
# Framed block-codec adapters (L4 Encoder<W>/Decoder<R> surface for
# ari/bwt/rle/mtf/dc — SURVEY.md §1 L4, VERDICT round-1 item 9)
# ---------------------------------------------------------------------------

import tpuzip
from tpuzip.io import CodecReader, CodecWriter


@pytest.mark.parametrize("codec", ["ari", "bwt", "rle", "mtf", "dc"])
def test_codec_stream_roundtrip(codec, samples):
    for s in samples:
        if len(s) > 40000:
            continue
        sink = io.BytesIO()
        with CodecWriter(sink, codec, block_size=1 << 13) as w:
            for i in range(0, len(s), 701):
                w.write(s[i : i + 701])
        r = CodecReader(io.BytesIO(sink.getvalue()), codec)
        assert r.read() == s


def test_codec_stream_incremental_read():
    s = bytes(np.random.default_rng(3).integers(0, 64, 20000, dtype=np.uint8))
    sink = io.BytesIO()
    with CodecWriter(sink, "ari", block_size=4096) as w:
        w.write(s)
    r = CodecReader(io.BytesIO(sink.getvalue()), "ari")
    got = bytearray()
    while True:
        piece = r.read(997)
        if not piece:
            break
        got += piece
    assert bytes(got) == s


def test_codec_stream_nesting_ari_over_bwt():
    """ari::ByteEncoder over bwt::Encoder, the reference's composition idiom
    (SURVEY.md:107)."""
    s = (b"banana banana banana " * 800)[:16000]
    inner = io.BytesIO()
    bw = CodecWriter(inner, "bwt", block_size=1 << 12)
    with CodecWriter(bw, "ari", block_size=1 << 12) as aw:
        aw.write(s)
    bw.close()
    # unwrap: bwt -> ari-framed stream -> plaintext
    lvl1 = CodecReader(io.BytesIO(inner.getvalue()), "bwt").read()
    assert CodecReader(io.BytesIO(lvl1), "ari").read() == s


def test_codec_stream_mtf_over_bwt_over_rle():
    s = b"abracadabra" * 900
    inner = io.BytesIO()
    rw = CodecWriter(inner, "rle", block_size=1 << 12)
    bw = CodecWriter(rw, "bwt", block_size=1 << 12)
    with CodecWriter(bw, "mtf", block_size=1 << 12) as mw:
        mw.write(s)
    bw.close()
    rw.close()
    lvl1 = CodecReader(io.BytesIO(inner.getvalue()), "rle").read()
    lvl2 = CodecReader(io.BytesIO(lvl1), "bwt").read()
    assert CodecReader(io.BytesIO(lvl2), "mtf").read() == s


def test_codec_stream_via_open():
    s = b"open api " * 1000
    for codec in ("ari", "bwt", "rle", "mtf", "dc"):
        sink = io.BytesIO()
        with tpuzip.open(sink, "wb", format=codec) as w:
            w.write(s)
        assert tpuzip.open(io.BytesIO(sink.getvalue()), "rb",
                           format=codec).read() == s


def test_codec_stream_truncation_detected():
    s = b"truncate me " * 500
    sink = io.BytesIO()
    with CodecWriter(sink, "ari") as w:
        w.write(s)
    data = sink.getvalue()
    with pytest.raises(ValueError, match="truncated"):
        CodecReader(io.BytesIO(data[: len(data) // 2]), "ari").read()


def test_codec_adapters_batched_equals_oracle_path():
    """VERDICT r2 item 5: the batched production path must emit byte-
    identical frames to the per-block oracle path, and decode either."""
    import io as pyio

    import numpy as np

    from tpuzip.io import CodecReader, CodecWriter

    rng = np.random.default_rng(11)
    data = (open("/root/repo/SURVEY.md", "rb").read()
            + bytes(rng.integers(0, 8, 40000, dtype=np.uint8)))[:70000]
    for codec in ("ari", "bwt", "rle", "mtf", "dc"):
        batched, oracle = pyio.BytesIO(), pyio.BytesIO()
        with CodecWriter(batched, codec, block_size=4096) as w:
            for k in range(0, len(data), 1000):  # ragged writes
                w.write(data[k : k + 1000])
        with CodecWriter(oracle, codec, block_size=4096,
                         batch_blocks=1) as w:
            w.write(data)
        assert batched.getvalue() == oracle.getvalue(), codec
        batched.seek(0)
        assert CodecReader(batched, codec).read() == data, codec
        oracle.seek(0)
        assert CodecReader(oracle, codec,
                           batch_blocks=1).read() == data, codec


def test_lz4_frame_writer_batched_native(rng):
    """Round-4 adapter batching (VERDICT r3 task 5): a multi-batch frame
    written through the threaded C++ stage is decodable by the oracle
    frame decoder, liblz4's frame API when present, and our reader —
    including the content checksum and a stored incompressible block."""
    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    text = (b"batched frame corpus line %d | " * 600) % tuple(range(600))
    s = text * 3 + bytes(rng.integers(0, 256, 70000, dtype=np.uint8))
    sink = io.BytesIO()
    with Lz4FrameWriter(sink, block_max=1 << 16, batch_blocks=4) as w:
        for i in range(0, len(s), 33333):
            w.write(s[i : i + 33333])
    frame = sink.getvalue()
    assert olz4.decompress_frame(frame) == s
    assert Lz4FrameReader(io.BytesIO(frame)).read() == s
    if liblz4.available() and hasattr(liblz4, "decompress_frame"):
        assert liblz4.decompress_frame(frame) == s


def test_zlib_writer_batched_fragments(rng):
    """Batched ZlibWriter splices threaded-C++ deflate fragments (each a
    BFINAL=0 stream ending in a Z_SYNC_FLUSH): the result must be ONE
    stock-zlib-accepted stream, bitwise-verified against the input, for
    batch sizes around every boundary."""
    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    base = (b"zlib fragment splice corpus " * 3000
            + bytes(rng.integers(0, 256, 9999, dtype=np.uint8)))
    for n in (0, 1, 4095, 4096, 4097, 3 * 4096 + 17, len(base)):
        s = base[:n]
        sink = io.BytesIO()
        with ZlibWriter(sink, block_size=4096, batch_blocks=3) as w:
            w.write(s)
        assert zlib.decompress(sink.getvalue()) == s, n


def test_deflate_fragment_splice_primitive():
    """native.deflate_fragment outputs byte-aligned non-final pieces that
    concatenate + final stored block == a valid deflate stream (every
    mode)."""
    from tpuzip.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    a, b = b"fragment one " * 400, b"fragment two, differs " * 300
    for mode in ("dynamic", "fixed", "stored"):
        fa = native.deflate_fragment(a, mode=mode)
        fb = native.deflate_fragment(b, mode=mode)
        stream = fa + fb + b"\x01\x00\x00\xff\xff"  # final empty stored
        d = zlib.decompressobj(wbits=-15)
        assert d.decompress(stream) + d.flush() == a + b, mode
