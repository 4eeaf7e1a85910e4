"""Property-based round-trip tests (hypothesis) over the oracle layer —
the formats every device codec is pinned to."""

import zlib

from hypothesis import given, settings, strategies as st

from tpuzip.oracle import ari, bwt, dc, deflate, lz4, mtf, rle

BYTES = st.binary(min_size=0, max_size=2000)
# run-heavy inputs stress RLE/LZ/BWT boundary logic
RUNS = st.lists(
    st.tuples(st.integers(0, 255), st.integers(1, 400)), min_size=0,
    max_size=20).map(lambda rs: b"".join(bytes([v]) * n for v, n in rs))


@settings(max_examples=50, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_lz4_block_roundtrip(data):
    assert lz4.decompress_block(lz4.compress_block(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_lz4_frame_roundtrip(data):
    assert lz4.decompress_frame(lz4.compress_frame(data, block_max=1 << 16)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_deflate_accepted_by_zlib(data):
    assert zlib.decompress(deflate.compress(data), wbits=-15) == data


@settings(max_examples=50, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_rle_roundtrip(data):
    assert rle.decode(rle.encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_bwt_mtf_roundtrip(data):
    L, origin = bwt.encode_block(data)
    m = mtf.encode(L)
    assert bwt.decode_block(mtf.decode(m), origin) == data


@settings(max_examples=30, deadline=None)
@given(st.one_of(BYTES, RUNS))
def test_dc_roundtrip(data):
    assert dc.decode(dc.encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(BYTES)
def test_ari_roundtrip(data):
    assert ari.decode_bytes(ari.encode_bytes(data), len(data)) == data
