import numpy as np

from tpuzip.oracle import bwt, dc, mtf


def test_bwt_known_value():
    # classic example: rotation-BWT of "banana"
    L, origin = bwt.encode_block(b"banana")
    assert bwt.decode_block(L, origin) == b"banana"


def test_bwt_block_roundtrip(samples):
    for s in samples:
        L, origin = bwt.encode_block(s)
        assert len(L) == len(s)
        assert bwt.decode_block(L, origin) == s


def test_bwt_fast_inverse_matches(samples):
    for s in samples:
        if len(s) > 20000:
            continue
        L, origin = bwt.encode_block(s)
        assert bwt.decode_block_fast(L, origin) == bwt.decode_block(L, origin)


def test_bwt_stream_roundtrip(samples):
    for s in samples:
        for bs in (256, 4096):
            assert bwt.decode(bwt.encode(s, block_size=bs)) == s


def test_bwt_groups_symbols():
    # BWT of repetitive text should have long runs (that's its whole point)
    text = b"abracadabra " * 200
    L, _ = bwt.encode_block(text)
    arr = np.frombuffer(L, dtype=np.uint8)
    runs = 1 + int(np.count_nonzero(np.diff(arr)))
    assert runs < len(arr) // 4


def test_mtf_roundtrip(samples):
    for s in samples:
        assert mtf.decode(mtf.encode(s)) == s


def test_mtf_known():
    assert mtf.encode(b"\x00\x00\x00") == b"\x00\x00\x00"
    # 'b'=0x62 is at index 0x62 initially; then 'a'=0x61 is at 0x62 after b moved front
    out = mtf.encode(b"ba")
    assert out[0] == 0x62
    assert out[1] == 0x62


def test_dc_roundtrip(samples):
    for s in samples:
        assert dc.decode(dc.encode(s)) == s


def test_dc_on_bwt_output(samples):
    # the intended pipeline position: DC over BWT last columns
    for s in samples:
        if not s or len(s) > 20000:
            continue
        L, origin = bwt.encode_block(s)
        assert dc.decode(dc.encode(L)) == L
